"""uno_tpu — a TPU-native JAX operator-learning framework.

Re-designed from scratch with the capabilities of the U-NO reference
(ashiq24/UNO, arXiv:2204.11127): U-shaped neural operators built from
truncated-mode Fourier integral operators, with Fourier-domain domain
contraction/expansion, trained on Darcy-flow and Navier-Stokes benchmarks.

Layout:
    ops/       pure-function numerics (spectral convs, resampling, norms)
    nn/        flax layers (SpectralConv, PointwiseOp, OperatorBlock, Dense)
    models/    U-NO model families (Darcy 2D, NS 2D, NS 3D spatiotemporal)
    optim      complex-aware Adam (optax transform) + StepLR schedule
    losses     relative Lp loss
    data/      .mat readers, dataset builders, JAX data generators (GRF,
               pseudo-spectral NS solver, Darcy solver)
    train/     jit'd training loops (Darcy, NS-2D autoregressive scan+remat,
               NS-3D), checkpointing, metrics
    parallel/  device mesh + data-parallel sharding (ICI), shard_map helpers
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences: uno_tpu.build_model, uno_tpu.TrainConfig, ...
    if name in ("build_model", "MODEL_REGISTRY", "UNOModel", "UNOSpec"):
        import uno_tpu.models as m

        return getattr(m, name)
    if name in ("TrainConfig", "train_darcy", "train_ns2d", "train_ns3d"):
        import uno_tpu.train as t

        return getattr(t, name)
    if name in ("export_forward", "load_forward"):
        import uno_tpu.export as e

        return getattr(e, name)
    if name == "relative_lp_loss":
        from uno_tpu.losses import relative_lp_loss

        return relative_lp_loss
    if name in ("complex_adam", "step_lr"):
        import uno_tpu.optim as o

        return getattr(o, name)
    raise AttributeError(name)
