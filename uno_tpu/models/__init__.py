from uno_tpu.models.core import LIFT, BlockSpec, UNOModel, UNOSpec
from uno_tpu.models.uno2d import uno, uno9, uno11, uno_demo, uno_p, uno_s256
from uno_tpu.models.uno3d import (
    uno3d_t9,
    uno3d_t9_256,
    uno3d_t10,
    uno3d_t10_256,
    uno3d_t20,
    uno3d_t20_256,
    uno3d_t40,
    uno3d_t40_256,
)

MODEL_REGISTRY = {
    "uno9": uno9,
    "uno11": uno11,
    "uno": uno,
    "uno_p": uno_p,
    "uno_s256": uno_s256,
    "uno_demo": uno_demo,
    "uno3d_t40": uno3d_t40,
    "uno3d_t20": uno3d_t20,
    "uno3d_t10": uno3d_t10,
    "uno3d_t9": uno3d_t9,
    "uno3d_t40_256": uno3d_t40_256,
    "uno3d_t20_256": uno3d_t20_256,
    "uno3d_t10_256": uno3d_t10_256,
    "uno3d_t9_256": uno3d_t9_256,
}


def build_model(name: str, dtype=None, remat_blocks=None, pad_to=None, **kwargs):
    """Returns a UNOModel for a registered spec name.

    ``dtype``/``remat_blocks``/``pad_to`` override the spec's
    precision/remat/padding policies.
    """
    import dataclasses

    spec = MODEL_REGISTRY[name](**kwargs)
    over = {}
    if dtype is not None:
        over["dtype"] = dtype
    if remat_blocks is not None:
        over["remat_blocks"] = remat_blocks
    if pad_to is not None:
        over["pad_to"] = pad_to
    if over:
        spec = dataclasses.replace(spec, **over)
    return UNOModel(spec)


__all__ = [
    "LIFT",
    "BlockSpec",
    "UNOModel",
    "UNOSpec",
    "MODEL_REGISTRY",
    "build_model",
    "uno",
    "uno9",
    "uno11",
    "uno_p",
    "uno_s256",
    "uno_demo",
    "uno3d_t40",
    "uno3d_t20",
    "uno3d_t10",
    "uno3d_t9",
    "uno3d_t40_256",
    "uno3d_t20_256",
    "uno3d_t10_256",
    "uno3d_t9_256",
]
