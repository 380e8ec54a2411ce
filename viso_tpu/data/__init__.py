"""viso_tpu.data"""
