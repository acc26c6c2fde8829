from .config import AggrConfig, AttRNNConfig, TransEncConfig
from .attrnn import (
    apply_aggr_attrnn,
    apply_attrnn,
    apply_attrnn_ss,
    init_aggr_attrnn,
    init_attrnn,
)
from .convert import torch_ckpt_to_params, load_torch_state_dict

__all__ = [
    "AggrConfig",
    "AttRNNConfig",
    "TransEncConfig",
    "apply_attrnn",
    "apply_attrnn_ss",
    "apply_aggr_attrnn",
    "init_attrnn",
    "init_aggr_attrnn",
    "torch_ckpt_to_params",
    "load_torch_state_dict",
]
