"""TPU-vs-host accuracy of the matmul-DFT on a SPREAD-LIKE (spiky) field.

The smooth-field roundtrip measures 2.3e-14 on TPU (tools/dft_acc_probe),
but the tier-2 VG velocity error (3.3e-7 TPU vs 9e-9 CPU at identical
algorithm, tools/vg_probe 2026-08-21) implicates TPU arithmetic fed by
the window-spread source field, whose spectrum is FLAT where a smooth
field's has decayed.  This compares rfft2 of an ES-spread random source
field against numpy's FFT, and the symbol-assembly chain u_hat =
Bhat ky^2 Fx at tier-2-like magnitudes.

Usage: python tools/spiky_fft_probe.py            (TPU)
       PROBE_N=4096,4288 PROBE_S=8100
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    from ipde_tpu.ops.fourier import FourierPlan2D
    from ipde_tpu.ops.interp import _es_kernel

    nx, ny = (int(v) for v in
              os.environ.get("PROBE_N", "2048,2144").split(","))
    S = int(os.environ.get("PROBE_S", 8100))
    w = 16
    beta = 2.30 * w
    rng = np.random.default_rng(7)

    # ES-spread S random ±O(1) sources at random offsets (the VG spread)
    f = np.zeros((nx, ny))
    gx = rng.uniform(w, nx - w, S)
    gy = rng.uniform(w, ny - w, S)
    q = rng.standard_normal(S)
    jx = np.floor(gx).astype(int) - (w // 2 - 1)
    jy = np.floor(gy).astype(int) - (w // 2 - 1)
    px = jx[:, None] + np.arange(w)[None, :]
    py = jy[:, None] + np.arange(w)[None, :]
    wx = _es_kernel((gx[:, None] - px) / (w / 2), beta)
    wy = _es_kernel((gy[:, None] - py) / (w / 2), beta)
    for i in range(S):
        f[np.ix_(px[i], py[i])] += q[i] * np.outer(wx[i], wy[i])

    # host reference spectrum (numpy FFT, true f64)
    F_ref = np.fft.rfft2(f.T).T  # match half-over-x: transpose game
    F_ref = np.fft.fft2(f)[: nx // 2 + 1]

    plan = FourierPlan2D(nx, ny, native=False)
    c = plan.rfft2(jnp.asarray(f))
    F_dev = np.asarray(c.re) + 1j * np.asarray(c.im)
    scale = np.abs(F_ref).max()
    err = np.abs(F_dev - F_ref)
    print(f"backend={jax.default_backend()} grid={nx}x{ny} S={S}")
    print(f"[fwd] max abs err {err.max():.3e}  rel-to-peak "
          f"{err.max()/scale:.3e}  (peak |F| {scale:.3e})", flush=True)

    # symbol assembly chain at representative magnitudes:
    # t = ky * F; w = (1/k^2-like) * t; u_hat = ky * w  -- elementwise ds ops
    kx = 2 * np.pi * np.fft.fftfreq(nx, 1.0 / nx)[: nx // 2 + 1]
    ky = 2 * np.pi * np.fft.fftfreq(ny, 1.0 / ny)
    KX, KY = kx[:, None], ky[None, :]
    K2 = KX**2 + KY**2
    B = np.where(K2 > 0, 1.0 / np.where(K2 > 0, K2, 1.0) ** 2, 0.0)
    uhat_ref = B * KY**2 * F_ref
    Bd, KYd = jnp.asarray(B), jnp.asarray(np.broadcast_to(KY, B.shape))
    re = jnp.asarray(F_ref.real)
    im = jnp.asarray(F_ref.imag)
    ur = np.asarray(Bd * (KYd * (KYd * re)))
    ui = np.asarray(Bd * (KYd * (KYd * im)))
    aerr = np.abs((ur + 1j * ui) - uhat_ref)
    print(f"[asm] max abs err {aerr.max():.3e}  rel-to-peak "
          f"{aerr.max()/np.abs(uhat_ref).max():.3e}", flush=True)

    # inverse transform of the reference u_hat: error lands in real space
    ui_ref2 = np.fft.irfft2(
        np.concatenate([uhat_ref,
                        np.conj(uhat_ref[1: nx - nx // 2][::-1, :]
                                [:, np.r_[0, ny - 1: 0: -1]])], axis=0),
        s=(nx, ny))
    from ipde_tpu.ops.cx import Cx
    ub = np.asarray(plan.irfft2_real(Cx(jnp.asarray(uhat_ref.real),
                                        jnp.asarray(uhat_ref.imag))))
    ierr = np.abs(ub - ui_ref2)
    print(f"[inv] max abs err {ierr.max():.3e}  field peak "
          f"{np.abs(ui_ref2).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
