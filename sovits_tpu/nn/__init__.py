"""L1 neural building blocks (flax.linen, channels-last)."""

from .attention import FFN, FFT, Encoder, MultiHeadAttention
from .conv import (
    Conv1d,
    ConvTranspose1d,
    SeparableConv1d,
    fold_weight_norm,
    make_conv1d,
    torch_conv_kernel_init,
)
from .flows import (
    ResidualCouplingBlock,
    ResidualCouplingLayer,
    TransformerCouplingBlock,
    TransformerCouplingLayer,
    flip_channels,
)
from .norm import LayerNorm
from .resblocks import LRELU_SLOPE, ResBlock1, ResBlock2, leaky_relu
from .wavenet import WaveNet, gated_tanh_sigmoid
