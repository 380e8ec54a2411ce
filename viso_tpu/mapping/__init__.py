"""viso_tpu.mapping"""
