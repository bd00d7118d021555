"""TPU-accuracy probe of the device special functions and VG velocity
machinery: J0/J1/J2 vs scipy, the truncated symbols vs the host formulas,
and the device Hankel tables vs a host-quadrature rebuild.  Finds which
layer carries the ~5e-9 velocity error the grid-eval bisect measured.
Usage: python tools/dev_special_probe.py  (on the TPU backend)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import scipy.special as ss
    from ipde_tpu.ops.kernels import bessel_j0, bessel_j1, bessel_j2
    from ipde_tpu.ops import grid_eval as ge

    print(f"backend={jax.default_backend()}", flush=True)
    z = np.linspace(0.0, 300.0, 200001)
    for name, dev, ref in (("J0", bessel_j0, ss.j0), ("J1", bessel_j1, ss.j1),
                           ("J2", bessel_j2, lambda x: ss.jv(2, x))):
        d = np.asarray(dev(jnp.asarray(z)))
        r = ref(z)
        i = np.argmax(np.abs(d - r))
        print(f"{name}: max abs err {np.abs(d - r).max():.3e} at z={z[i]:.2f}",
              flush=True)

    # bench-like scales: grid (1280, 1312), h ~ 2pi-ish box
    hx = 0.0049
    eta = np.pi / (11.4 * hx)
    L = 2.2
    kmax = 12.0 * eta
    kk = np.linspace(0.0, kmax, 100001)
    sd = np.asarray(ge.biharmonic_truncated_symbol_dev(jnp.asarray(kk), L))
    sh = ge.biharmonic_truncated_symbol(kk, L)
    scale = np.abs(sh).max()
    print(f"biharmonic symbol: max abs {np.abs(sd-sh).max():.3e} "
          f"rel-to-max {np.abs(sd-sh).max()/scale:.3e}", flush=True)
    ld = np.asarray(ge.laplace_truncated_symbol_dev(jnp.asarray(kk), L))
    lh = ge.laplace_truncated_symbol(kk, L)
    print(f"laplace symbol:    max abs {np.abs(ld-lh).max():.3e} "
          f"rel-to-max {np.abs(ld-lh).max()/np.abs(lh).max():.3e}", flush=True)

    # Hankel tables, dev vs host quadrature with scipy J's
    screen_v = lambda k: (1.0 + k**2 / (4 * eta**2)) * np.exp(
        -(k**2) / (4 * eta**2))
    screen_v_d = lambda k: (1.0 + k**2 / (4 * eta**2)) * jnp.exp(
        -(k**2) / (4 * eta**2))
    bsym_h = lambda k: ge.biharmonic_truncated_symbol(k, L) * screen_v(k)
    bsym_d = lambda k: ge.biharmonic_truncated_symbol_dev(k, L) \
        * screen_v_d(k)
    r_max = 0.16
    tabs_d = ge._radial_hankel_tables_dev(
        bsym_d, kmax, L, r_max, [ge._m_j1_over_z_dev, ge._m_k2_j0_dev])
    mom_h = [lambda k, r: k * k * np.where(
                 k * r < 1e-8, 0.5 - (k * r) ** 2 / 16.0,
                 ss.j1(np.maximum(k * r, 1e-300)) / np.maximum(k * r, 1e-30)),
             lambda k, r: k * k * ss.j0(k * r)]
    tabs_h = ge._radial_hankel_tables(bsym_h, kmax, L, r_max, mom_h)
    for name, td, th in zip(("Tb(J1/z)", "Ta(k2J0)"), tabs_d, tabs_h):
        vd = np.asarray(td.tab)
        vh = th.tab
        print(f"table {name}: max abs {np.abs(vd-vh).max():.3e}  "
              f"(scale {np.abs(vh).max():.3e})", flush=True)


if __name__ == "__main__":
    main()
