from .cobafa import CobafaFeatureField
from .encodings import posenc_dim, positional_encoding
from .kplanes import (
    KPlanesExplicitColorDecoder,
    KPlanesExplicitOpacityDecoder,
    KPlanesFeatureField,
)
from .mlp import linear_apply, linear_init, mlp_apply, mlp_init
from .registry import METHODS, make_model
from .vanilla import ColorDecoder, OpacityDecoder, VanillaFeatureField

__all__ = [
    "CobafaFeatureField",
    "positional_encoding",
    "posenc_dim",
    "KPlanesFeatureField",
    "KPlanesExplicitOpacityDecoder",
    "KPlanesExplicitColorDecoder",
    "mlp_init",
    "mlp_apply",
    "linear_init",
    "linear_apply",
    "METHODS",
    "make_model",
    "VanillaFeatureField",
    "OpacityDecoder",
    "ColorDecoder",
]
