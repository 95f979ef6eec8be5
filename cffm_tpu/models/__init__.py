from cffm_tpu.models.cffm import (  # noqa: F401
    init_params,
    embedding_lookup,
    forward_from_rows,
    forward,
    field_offsets,
)
