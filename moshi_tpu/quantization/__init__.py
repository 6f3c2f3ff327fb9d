from .vq import (  # noqa: F401
    RVQConfig,
    ResidualVectorQuantizer,
    SplitResidualVectorQuantizer,
)
