from gogp_tpu.ops import linalg  # noqa: F401
