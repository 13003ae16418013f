from .interp import (
    bilinear_lookup,
    bilinear_lookup_mixed,
    sawtooth,
    trilinear_lookup,
    trilinear_lookup_mixed,
)
from .trunc_exp import truncated_exp
from .weights import compute_weights, compute_weights_naive

__all__ = [
    "bilinear_lookup",
    "bilinear_lookup_mixed",
    "trilinear_lookup",
    "trilinear_lookup_mixed",
    "sawtooth",
    "truncated_exp",
    "compute_weights",
    "compute_weights_naive",
]
