"""viso_tpu.backend"""
