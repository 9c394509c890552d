"""newton_krylov_ooc_tpu.core"""
