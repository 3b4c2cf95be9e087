from . import distances, masked, sparse
from .masked import masked_softmax, masked_mean, masked_max
from .sparse import sddmm, segment_softmax, spmm, edge_attention
