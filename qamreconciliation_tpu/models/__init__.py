from .alphabet import PAMAlphabet
from .matrix import Matrix
from .decoder import Decoder, TannerGraph
from .dvbs2 import Dvbs2Table, make_table as make_dvbs2_table
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
    "Dvbs2Table",
    "make_dvbs2_table",
]
