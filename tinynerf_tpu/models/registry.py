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
    method: str, fwd_clamp: bool = True
) -> Tuple[object, OpacityDecoder, ColorDecoder]:
    """Returns (feature_field, sigma_decoder, rgb_decoder).

    `fwd_clamp` threads TrainConfig.fwd_clamp (the truncated_exp forward-clamp
    A/B switch, ops/trunc_exp.py) into the sigma decoder statically.
    """
    if method == "vanilla":
        field = VanillaFeatureField(n_freqs=10, hidden_features=256, hidden_layers=8)
    elif method == "kplanes":
        field = KPlanesFeatureField(feature_dim_per_plane=32, resolutions=(129, 257, 513))
    elif method == "cobafa":
        field = CobafaFeatureField(
            basis_res=tuple(int(r) for r in np.linspace(32.0, 128.0, 6)),
            coef_res=64,
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
