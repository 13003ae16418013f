from .interp import bilinear_lookup, sawtooth, trilinear_lookup
from .trunc_exp import truncated_exp
from .weights import compute_weights, compute_weights_naive

__all__ = [
    "bilinear_lookup",
    "trilinear_lookup",
    "sawtooth",
    "truncated_exp",
    "compute_weights",
    "compute_weights_naive",
]
