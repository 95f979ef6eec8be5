from cffm_tpu.optim.rowwise import (  # noqa: F401
    rowwise_init,
    rowwise_update,
    make_dense_optimizer,
)
