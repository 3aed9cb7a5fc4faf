from gogp_tpu.ops import distributed, linalg  # noqa: F401
