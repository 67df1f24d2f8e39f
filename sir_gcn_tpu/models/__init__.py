from .conv import SIRConv, SIRConvBase, SIREConv, SIREConvBase
from .layers import Embed, Linear
from .norm import (
    ContraNorm,
    GraphBatchNorm,
    GraphContraNorm,
    GraphIdentity,
    GraphLayerNorm,
    GraphNorm,
    LayerNorm,
    MaskedBatchNorm,
    get_norm,
)
from .utils import MLP, CentralityEncoder, VirtualNode
from . import encoders, zoo
from .encoders import AtomEncoder, BondEncoder
from .zoo import (
    GATv2Conv,
    GINConv,
    GINEConv,
    GraphConv,
    PNAConv,
    pna_delta,
    SAGEConv,
)
