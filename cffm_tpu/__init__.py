"""cffm-tpu: a TPU-native CTR training/scoring engine (CFFM rebuild).

A from-scratch JAX/XLA/Pallas implementation of the CFFM stack
(reference: Anony-CFFM/CFFM — mount empty this round, built to
SURVEY.md's spec): row-sharded sparse embeddings with all-to-all ID
exchange, a convolutional feature-interaction core over the pairwise
cross map (fused Pallas forward/backward), a data-parallel MLP tower,
per-row Adagrad/Adam, and streaming hashed Criteo/Avazu input.
"""

__version__ = "0.1.0"

from cffm_tpu.config import (  # noqa: F401
    ModelConfig,
    TrainConfig,
    get_config,
)
