from .conv import StreamingConv1d, StreamingConvTranspose1d  # noqa: F401
from .norm import LayerNorm, RMSNorm, LayerScale  # noqa: F401
from .rope import apply_rope  # noqa: F401
from .transformer import (  # noqa: F401
    TransformerConfig,
    StreamingTransformer,
    ProjectedTransformer,
)
from .seanet import SEANetConfig, SEANetEncoder, SEANetDecoder  # noqa: F401
from .resample import ConvDownsample1d, ConvTrUpsample1d  # noqa: F401
