"""CLI end-to-end smoke: generated-data micro-training runs for all tasks."""

import sys

import numpy as np
import pytest

from uno_tpu.cli import main
from uno_tpu.configs import PRESETS, get_preset


def test_presets_registered():
    assert {
        "darcy_s211", "darcy_s85", "darcy_s421", "ns2d", "ns2d_s256",
        "ns3d_t40", "ns3d_t20", "ns3d_t10", "ns3d_t9",
    } <= set(PRESETS)


def test_preset_overrides():
    p = get_preset("darcy_s85", epochs=3, ntrain=8)
    assert p.train.epochs == 3
    assert p.ntrain == 8
    # original untouched
    assert PRESETS["darcy_s85"].train.epochs == 700


def test_compile_cache_flag(tmp_path):
    import jax

    from uno_tpu.cli import _setup_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        _setup_compile_cache(None)          # no-op
        _setup_compile_cache("none")        # explicit disable: no-op
        assert jax.config.jax_compilation_cache_dir == prev
        cache = tmp_path / "xla_cache"
        _setup_compile_cache(str(cache))
        assert jax.config.jax_compilation_cache_dir == str(cache)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


@pytest.mark.slow
def test_cli_train_darcy_generated():
    rc = main([
        "train", "--preset", "darcy_s85", "--generate",
        "--ntrain", "8", "--nval", "4", "--ntest", "4",
        "--epochs", "1", "--batch-size", "4",
    ])
    assert rc == 0


@pytest.mark.slow
def test_cli_train_ns3d_generated():
    rc = main([
        "train", "--preset", "ns3d_t10", "--generate",
        "--ntrain", "4", "--nval", "2", "--ntest", "2",
        "--epochs", "1", "--batch-size", "2",
    ])
    assert rc == 0


def test_cli_generate_ns(tmp_path):
    out = str(tmp_path / "ns.mat")
    rc = main([
        "generate", "--task", "ns", "--out", out, "--n", "4", "--size", "32",
        "--T", "0.05", "--delta-t", "0.01", "--record-steps", "20",
    ])
    assert rc == 0
    from uno_tpu.data import load_navier_stokes

    ta, tu, sa, su = load_navier_stokes(
        out, train=4, test=0, sample_num=4, batch=4, t_in=10, t_out=10, size=32
    )
    assert ta.shape == (4, 32, 32, 10)
    assert tu.shape == (4, 32, 32, 10)
