from cffm_tpu.ops.cross import (  # noqa: F401
    pair_indices,
    build_cross_map,
    conv_core_reference,
    interaction_conv_reference,
)
