from modern_search_engines_project_tpu.models.hash_encoder import HashingEncoder
from modern_search_engines_project_tpu.models.encoder import (
    BiEncoder,
    EncoderConfig,
    JaxEncoder,
)
from modern_search_engines_project_tpu.models.train import (
    TrainConfig,
    Trainer,
    cosine_loss,
    mine_hard_negatives,
)

__all__ = [
    "HashingEncoder",
    "BiEncoder",
    "EncoderConfig",
    "JaxEncoder",
    "TrainConfig",
    "Trainer",
    "cosine_loss",
    "mine_hard_negatives",
]
