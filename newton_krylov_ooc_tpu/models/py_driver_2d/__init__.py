"""newton_krylov_ooc_tpu.models.py_driver_2d"""
