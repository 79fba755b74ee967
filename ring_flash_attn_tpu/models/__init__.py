from .transformer import (
    ModelConfig,
    init_params,
    forward,
    loss_fn,
    train_step,
    param_specs,
    prepare_zigzag_batch,
)
from .serve import ServingEngine, SamplingParams

__all__ = [
    "ModelConfig",
    "init_params",
    "forward",
    "loss_fn",
    "train_step",
    "param_specs",
    "prepare_zigzag_batch",
    "ServingEngine",
    "SamplingParams",
]
