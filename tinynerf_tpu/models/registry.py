"""Method registry: wire field + decoders exactly as the reference's train()
does (reference src/run.py:130-152) — all three methods share the vanilla
sigma/color decoders; only the feature field differs.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .cobafa import CobafaFeatureField
from .kplanes import KPlanesFeatureField
from .vanilla import ColorDecoder, OpacityDecoder, VanillaFeatureField

METHODS = ("vanilla", "kplanes", "cobafa")


def make_model(
    method: str, fwd_clamp: bool = True, field_scale: float = 1.0
) -> Tuple[object, OpacityDecoder, ColorDecoder]:
    """Returns (feature_field, sigma_decoder, rgb_decoder).

    `fwd_clamp` threads TrainConfig.fwd_clamp (the truncated_exp forward-clamp
    A/B switch, ops/trunc_exp.py) into the sigma decoder statically.

    `field_scale` scales the field's SPATIAL capacity (table resolutions /
    MLP width) while keeping its structure — same scale count, same feature
    dims, same decoder interface, and for K-Planes the same 2r-1 resolution
    nesting the fused multiscale lookup requires.  1.0 = the reference
    configuration (src/run.py:130-152); small values give structurally
    identical fields that compile in seconds (tests, smoke runs).
    """
    s = float(field_scale)
    if method == "vanilla":
        field = VanillaFeatureField(
            n_freqs=10, hidden_features=max(32, int(round(256 * s))),
            hidden_layers=8,
        )
    elif method == "kplanes":
        # keep the fused lookup's nesting invariant r_{i+1} = 2*r_i - 1
        b = max(9, int(round(129 * s)) | 1)
        field = KPlanesFeatureField(
            feature_dim_per_plane=32, resolutions=(b, 2 * b - 1, 4 * b - 3)
        )
    elif method == "cobafa":
        field = CobafaFeatureField(
            basis_res=tuple(
                max(8, int(r * s)) for r in np.linspace(32.0, 128.0, 6)
            ),
            coef_res=max(8, int(64 * s)),
            freqs=tuple(float(f) for f in np.linspace(2.0, 8.0, 6)),
            channels=(8, 8, 8, 4, 4, 4),
            mlp_hidden_dim=128,
        )
    else:
        raise NotImplementedError(f"Unknown method {method!r}.")

    dim = field.feature_dim
    sigma_decoder = OpacityDecoder(feature_dim=dim, fwd_clamp=fwd_clamp)
    rgb_decoder = ColorDecoder(n_freqs=8, in_features=dim, hidden_features=64, hidden_layers=3)
    return field, sigma_decoder, rgb_decoder
