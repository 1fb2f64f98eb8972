from .alphabet import PAMAlphabet
from .matrix import Matrix
from .decoder import Decoder, TannerGraph
from .noisemapper import (
    NoiseMapper,
    NoiseDemapper,
    NoiseMapperFlipSign,
    NoiseMapperAntiFlipSign,
)

__all__ = [
    "PAMAlphabet",
    "Matrix",
    "Decoder",
    "TannerGraph",
    "NoiseMapper",
    "NoiseDemapper",
    "NoiseMapperFlipSign",
    "NoiseMapperAntiFlipSign",
]
