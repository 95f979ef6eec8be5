from cffm_tpu.data.loader import make_dataset  # noqa: F401
