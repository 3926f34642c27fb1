from . import initializers
from .attention import BiasAttention, CrossAttention, MultiHeadedAttention
from .graph import MGCN, HopPathEncoding, XFeat
from .layers import (DropPath, GatMlp, GraphLinear, GroupNormCF, Mlp,
                     StdLayerNorm, TorchDense)

__all__ = [
    "BiasAttention", "CrossAttention", "DropPath", "GatMlp", "GraphLinear",
    "GroupNormCF", "HopPathEncoding", "MGCN", "Mlp", "MultiHeadedAttention",
    "StdLayerNorm", "TorchDense", "XFeat", "initializers",
]
