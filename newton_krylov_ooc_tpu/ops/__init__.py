"""newton_krylov_ooc_tpu.ops"""
