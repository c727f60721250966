"""Measure what the NS generation fast profile changes vs the reference.

The reference generator (``ns_datagen.py:144-223``) integrates with
``delta_t=1e-4`` to ``T=50`` (50 snapshots, 1.0 time units apart).  The
CLI's default fast profile uses ``delta_t=1e-3`` and ``T=(t_in+t_f)*0.5``
(snapshots 0.5 apart) — 10x fewer solver steps.  This script quantifies the
two deviations separately (RESULTS.md records the output):

1. **Integration error of the coarser step**: same initial conditions, same
   horizon T=25 — rel-L2 between the dt=1e-3 and dt=1e-4 solutions per
   snapshot, plus energy-spectrum comparison at the final time.
2. **Snapshot spacing**: statistics (RMS vorticity, energy spectrum slope)
   of the T=25/dt=1e-3 fast dataset vs the T=50/dt=1e-4 reference-profile
   dataset.

Usage:  python examples/gen_profile_compare.py [--n 4] [--size 64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def energy_spectrum(w: np.ndarray) -> np.ndarray:
    """Radially-binned kinetic-energy spectrum from vorticity (s, s)."""
    s = w.shape[-1]
    wh = np.fft.fft2(w) / (s * s)
    k = np.fft.fftfreq(s, 1.0 / s)
    kx, ky = np.meshgrid(k, k, indexing="ij")
    k2 = kx**2 + ky**2
    k2[0, 0] = 1.0
    # E(k) dk from |psi_hat|^2: u_hat = (ik x) psi_hat, psi = -lap^-1 w
    e_density = 0.5 * np.abs(wh) ** 2 / k2
    kr = np.sqrt(k2).astype(int).ravel()
    spec = np.bincount(kr, weights=e_density.ravel(), minlength=s)
    return spec[: s // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--out", default="runs/gen_profile_compare.json")
    args = ap.parse_args()

    import jax

    from uno_tpu.data import GaussianRF, default_forcing, navier_stokes_2d

    s = args.size
    grf = GaussianRF(2, s, alpha=2.5, tau=7.0)
    f = default_forcing(s)
    w0 = grf.sample(jax.random.PRNGKey(0), args.n)

    # --- 1. integration error at the same horizon -------------------------
    fast, _ = navier_stokes_2d(w0, f, visc=1e-3, T=25.0, delta_t=1e-3,
                               record_steps=50)
    ref25, _ = navier_stokes_2d(w0, f, visc=1e-3, T=25.0, delta_t=1e-4,
                                record_steps=50)
    fast = np.asarray(fast)
    ref25 = np.asarray(ref25)
    rel = np.linalg.norm(
        (fast - ref25).reshape(args.n, -1, 50), axis=1
    ) / np.linalg.norm(ref25.reshape(args.n, -1, 50), axis=1)
    step_err = rel.mean(axis=0)

    # --- 2. snapshot-spacing statistics ----------------------------------
    ref50, _ = navier_stokes_2d(w0, f, visc=1e-3, T=50.0, delta_t=1e-4,
                                record_steps=50)
    ref50 = np.asarray(ref50)

    def stats(sol):
        last = sol[..., -1]
        spec = np.stack([energy_spectrum(last[i]) for i in range(args.n)])
        return {
            "rms_vorticity_last": float(np.sqrt((last**2).mean())),
            "rms_vorticity_mid": float(np.sqrt((sol[..., 25] ** 2).mean())),
            "spectrum_last_mean": spec.mean(axis=0)[:16].tolist(),
        }

    out = {
        "size": s,
        "n": args.n,
        "dt_error_rel_l2_first_snapshot": float(step_err[0]),
        "dt_error_rel_l2_snapshot10": float(step_err[9]),
        "dt_error_rel_l2_final": float(step_err[-1]),
        "fast_profile": stats(fast),
        "reference_profile": stats(ref50),
    }
    with open(args.out, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
