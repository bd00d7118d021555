"""Accuracy of the VG truncated-kernel symbols vs a 50-digit mpmath
reference, for the device implementation (TPU: series + table-J in
emulated f64), the host closed form (scipy J, true f64 -- cancels badly
at small z), and the host hybrid (series below z=6, closed form above).

The tier-2 VG Stokeslet u,v error (3.3e-7 abs / 1.6e-9 rel vs dense,
tools/vg_probe.py 2026-08-21) implicates the BIHARMONIC symbol chain;
this isolates the symbol itself.

Usage: python tools/symbol_acc_probe.py          (device backend)
       BENCH_PLATFORM=cpu ... (host-only sanity)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mp_biharmonic(kk, L, dps=50):
    import mpmath as mp
    mp.mp.dps = dps
    out = []
    Lm = mp.mpf(L)
    for k in kk:
        km = mp.mpf(k)
        z = km * Lm
        if z == 0:
            out.append(Lm**4 * (4 * mp.log(Lm) - 5) / 64)
            continue
        J0, J1, J2 = mp.besselj(0, z), mp.besselj(1, z), mp.besselj(2, z)
        num = ((mp.log(Lm) - 1) * (z**3 * J1 - 2 * z**2 * J2)
               - z**2 * J2 + 4 * (1 - J0) - 2 * z * J1)
        out.append(num / (4 * km**4))
    return np.array([float(v) for v in out])


def mp_laplace(kk, L, dps=50):
    import mpmath as mp
    mp.mp.dps = dps
    out = []
    Lm = mp.mpf(L)
    for k in kk:
        km = mp.mpf(k)
        z = km * Lm
        if z == 0:
            out.append(-(Lm**2 / 2) * (mp.log(Lm) - mp.mpf(1) / 2))
            continue
        num = (1 - mp.besselj(0, z)) - z * mp.log(Lm) * mp.besselj(1, z)
        out.append(num / km**2)
    return np.array([float(v) for v in out])


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    from ipde_tpu.ops import grid_eval as ge

    L = 1.37
    z = np.concatenate([np.geomspace(1e-4, 5.99, 60),
                        np.geomspace(6.01, 3000.0, 120)])
    kk = z / L

    refB = mp_biharmonic(kk, L)
    refQ = mp_laplace(kk, L)
    scaleB = np.abs(refB).max()
    scaleQ = np.abs(refQ).max()

    devB = np.asarray(ge.biharmonic_truncated_symbol_dev(kk, L))
    devQ = np.asarray(ge.laplace_truncated_symbol_dev(kk, L))
    hostB = ge.biharmonic_truncated_symbol(kk, L)
    hostQ = ge.laplace_truncated_symbol(kk, L)

    def rep(tag, got, ref, scale):
        err = np.abs(got - ref)
        rel = err / np.maximum(np.abs(ref), 1e-300)
        i = int(np.argmax(err / scale))
        print(f"{tag}: max-rel-to-peak {err.max()/scale:.2e}  "
              f"max-pointwise-rel {rel.max():.2e}  worst at z={z[i]:.3g}",
              flush=True)

    print(f"backend={jax.default_backend()}  L={L}")
    rep("dev  biharmonic", devB, refB, scaleB)
    rep("host biharmonic", hostB, refB, scaleB)
    rep("dev  laplace   ", devQ, refQ, scaleQ)
    rep("host laplace   ", hostQ, refQ, scaleQ)

    if hasattr(ge, "biharmonic_truncated_symbol_acc"):
        accB = ge.biharmonic_truncated_symbol_acc(kk, L)
        accQ = ge.laplace_truncated_symbol_acc(kk, L)
        rep("acc  biharmonic", accB, refB, scaleB)
        rep("acc  laplace   ", accQ, refQ, scaleQ)


if __name__ == "__main__":
    main()
