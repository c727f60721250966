from uno_tpu.nn.layers import (
    Dense,
    OperatorBlock,
    PointwiseOp,
    SpectralConv,
    gelu,
)

__all__ = ["Dense", "OperatorBlock", "PointwiseOp", "SpectralConv", "gelu"]
