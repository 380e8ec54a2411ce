"""viso_tpu.utils"""
