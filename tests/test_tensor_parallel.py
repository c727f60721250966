"""Channel (tensor-parallel analogue) sharding of spectral weights.

SURVEY.md §2.5 lists channel-sharded spectral-weight einsum as the TP
analogue for the wide bottleneck blocks.  Under jit, sharding the output-
channel axis of the weights over a mesh axis makes XLA partition the
per-mode contraction and all-gather the spectrum — no code changes in the
op itself.  This test pins that the sharded execution matches replicated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uno_tpu.ops import spectral
from uno_tpu.ops.spectral import spectral_conv_2d, spectral_weight_init
from uno_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_channel_sharded_weights_match_replicated():
    mesh = make_mesh(n_data=4, n_spatial=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16, 64, 64)), jnp.float32)
    w = spectral_weight_init(jax.random.PRNGKey(0), 16, 32, (9, 9), 2)

    spectral.set_pallas_mode(False)  # XLA path partitions dot_general
    try:
        fn = jax.jit(lambda x, w: spectral_conv_2d(x, w, (64, 64), (9, 9)))
        want = np.asarray(fn(x, w))

        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        # shard the out-channel axis of (blocks, Ci, Co, m1, m2) over 'spatial'
        ws = jax.device_put(w, NamedSharding(mesh, P(None, None, "spatial")))
        got = np.asarray(fn(xs, ws))
    finally:
        spectral.set_pallas_mode(None)
    np.testing.assert_allclose(got, want, atol=1e-5)
