"""U-NO tutorial — the UNO_Tutorial.ipynb walkthrough, TPU-native.

Demonstrates, like the reference notebook:
1. A single OperatorBlock as a non-linear operator G mapping a function on
   (0,1)² (grid 100²) to a function on (0,0.5)² (grid 50²) with a larger
   co-domain — domain contraction as an output-grid argument.
2. Discretization invariance: the same weights applied at 1000² and 500².
3. Training the 13-block UNO_demo on a GRF toy problem u = a² - 5a with
   noisy inputs, watching the relative-L2 fall.

Run: python examples/tutorial.py [--epochs 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from uno_tpu.data import GaussianRF
from uno_tpu.losses import relative_lp_loss
from uno_tpu.models import build_model
from uno_tpu.nn import OperatorBlock
from uno_tpu.optim import complex_adam
from uno_tpu.train.state import TrainState, apply_updates
from uno_tpu.utils.summary import count_params


def single_block_demo():
    print("== 1. OperatorBlock: G(f): (0,1)^2 -> R^4 on (0,0.5)^2 ==")
    # f(x,y) = [x^2+y, x+y^2] discretized at 100x100
    t = np.linspace(0, 1, 100, endpoint=False)
    xx, yy = np.meshgrid(t, t, indexing="ij")
    f = np.stack([xx**2 + yy, xx + yy**2])[None].astype(np.float32)  # (1,2,100,100)

    block = OperatorBlock(in_codim=2, out_codim=4, modes=(14, 14))
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(f), (50, 50))
    g = block.apply(params, jnp.asarray(f), (50, 50))
    print(f"   G(f) shape: {g.shape}  (domain contracted 100² -> 50²)")

    print("== 2. Discretization invariance: same weights at 1000²/500² ==")
    t_hi = np.linspace(0, 1, 1000, endpoint=False)
    xh, yh = np.meshgrid(t_hi, t_hi, indexing="ij")
    f_hi = np.stack([xh**2 + yh, xh + yh**2])[None].astype(np.float32)
    g_hi = block.apply(params, jnp.asarray(f_hi), (500, 500))
    print(f"   G(f_1000) shape: {g_hi.shape}")
    # outputs agree on the shared grid points (band-limited input)
    a = np.asarray(g)[0, 0]
    b = np.asarray(g_hi)[0, 0, ::10, ::10]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    print(f"   correlation on shared grid points: {corr:.4f}")


def train_demo(epochs: int):
    print("== 3. Train UNO_demo on GRF toy data (u = a² - 5a) ==")
    s, n = 64, 128
    grf = GaussianRF(2, s, alpha=2.5, tau=7.0)
    a = np.asarray(grf.sample(jax.random.PRNGKey(1), n))
    u = a**2 - 5 * a
    noise = 0.1 * np.random.default_rng(0).standard_normal(a.shape)
    x = (a + noise).astype(np.float32)[..., None]
    y = u.astype(np.float32)

    model = build_model("uno_demo", in_width=3, width=16, pad=8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    print(f"   parameters: {count_params(params):,}")

    tx = complex_adam(1e-3, weight_decay=1e-6)
    state = TrainState.create(params, tx)

    @jax.jit
    def step(state, xb, yb):
        def loss_fn(p):
            out = model.apply(p, xb)[..., 0]
            return relative_lp_loss(out, yb, reduction="mean")

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    bs = 32
    for ep in range(epochs):
        perm = np.random.default_rng(ep).permutation(n)
        losses = []
        for i in range(0, n, bs):
            idx = perm[i : i + bs]
            state, loss = step(state, jnp.asarray(x[idx]), jnp.asarray(y[idx]))
            losses.append(float(loss))
        if ep % max(1, epochs // 10) == 0 or ep == epochs - 1:
            print(f"   epoch {ep:3d}  rel-L2 {np.mean(losses):.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()
    single_block_demo()
    train_demo(args.epochs)
