from .gat import GAT, GATBlock, GatSpec
from .gator import GATOR, GatorSpec, forward_gator, init_gat, init_gator
from .mdr import MDR, Conv1dLen3, CrossAttentionBlock, MdrSpec, conv1d_len3

__all__ = [
    "GAT", "GATBlock", "GATOR", "GatSpec", "GatorSpec", "MDR", "MdrSpec",
    "Conv1dLen3", "CrossAttentionBlock", "conv1d_len3", "forward_gator",
    "init_gat", "init_gator",
]
