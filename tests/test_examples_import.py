"""Every examples/*.py must at least import from a bare interpreter.

Round-4 regression: three evidence-regeneration legs (512² super-res,
gen-profile compare, spatial scaling) all died with
``ModuleNotFoundError: uno_tpu`` because the scripts lacked the
``sys.path`` bootstrap the other examples carry, and the failures went
unnoticed (VERDICT r4 weak #4; runs/round4_chain3.out).  This test
imports each script the way ``python examples/foo.py`` would — from a
subprocess-like sys.path view WITHOUT the repo root — so a missing
bootstrap fails here instead of six hours into an evidence chain.
"""

import importlib.util
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_imports(path):
    # A fresh interpreter with cwd=/ reproduces the chain-script failure
    # mode exactly: the repo root is NOT on sys.path unless the script
    # bootstraps it.  -c exec(read) mirrors `python examples/foo.py`
    # while keeping argv empty (all examples are __main__-guarded).
    code = (
        "import runpy, sys; sys.argv = ['x']; "
        f"runpy.run_path({str(path)!r}, run_name='not_main')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/",
        capture_output=True,
        text=True,
        timeout=300,
        env={"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
    )
    assert proc.returncode == 0, (
        f"{path.name} failed to import:\n{proc.stderr[-2000:]}"
    )


def test_all_examples_have_bootstrap():
    """Every example must insert the repo root before importing uno_tpu."""
    for path in EXAMPLES:
        src = path.read_text()
        if "uno_tpu" not in src:
            continue
        assert "sys.path.insert" in src, (
            f"{path.name} imports uno_tpu but has no sys.path bootstrap — "
            "it will ModuleNotFoundError when run as a script from "
            "outside the repo root"
        )
