"""viso_tpu.slam"""
