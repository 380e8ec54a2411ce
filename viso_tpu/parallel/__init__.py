"""viso_tpu.parallel"""
