from dip_tpu.data.synthetic import synthetic_image, SYNTHETIC_SET

__all__ = ["synthetic_image", "SYNTHETIC_SET"]
