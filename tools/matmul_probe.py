"""Probe TPU f64 matrix-matrix accuracy on QFS/QR-shaped computations.

The known gotcha (memory/tpu-f64-numerics-gotchas.md): f64 dot_general can
be erratically wrong (~2^-24 absolute) for specific operand data.  Dense
kernel matVECs are routed through multiply+reduce; this probe checks whether
matrix-MATRIX products of real QFS kernel matrices (the building block of a
device-side CholQR pseudo-inverse) hit the same bug.

Run: python tools/matmul_probe.py  (on the TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ipde_tpu.geometry.curve import star
    from ipde_tpu.geometry.embedded_boundary import EmbeddedBoundary
    from ipde_tpu.ops import stokes_kernels as sk
    from ipde_tpu.ops import singular as sq

    print("backend:", jax.default_backend())
    nb, M = 600, 10
    bdy = star(nb, a=0.2, f=5)
    bh = min(bdy.min_h(), 0.6 / np.abs(bdy.curvature).max() / M)
    ebdy = EmbeddedBoundary(bdy, True, M, bh, qfs_tolerance=1e-14)
    src = ebdy.qfs_source_for_side("interface", interior_eval=True)
    ifc = ebdy.interface
    # Stokes QFS system: (2*nb, 2*n_src)
    A = sk.stokes_slp_naive(src, ifc.x, ifc.y)
    print("A shape", A.shape, "norm", np.linalg.norm(A))
    B = A.T.copy()          # tall (2 n_src, 2 nb)

    hi = jax.lax.Precision.HIGHEST
    mm = jax.jit(lambda x, y: jnp.matmul(x, y, precision=hi))

    dB = jnp.asarray(B)
    dA = jnp.asarray(A)

    # 1. Gram matrix G = B^T B (the CholQR building block)
    G_dev = np.asarray(mm(dB.T, dB))
    G_host = B.T @ B
    scale = np.abs(G_host).max()
    err = np.abs(G_dev - G_host).max()
    print(f"G = B^T B        abs err {err:.2e}  (scale {scale:.1e},"
          f" rel {err/scale:.2e})")

    # 2. A @ dense smooth matrix (compose-like)
    C = sq.laplace_slp_naive(src, ifc.x, ifc.y)
    C2 = np.concatenate([C, C], axis=0)  # (2nb, 2 n_src) -> no; fix shapes
    D = np.random.standard_normal((A.shape[1], A.shape[0]))
    # smooth columns: low-frequency fourier data (kernel-like smoothness)
    t = np.linspace(0, 2 * np.pi, A.shape[1], endpoint=False)
    D_smooth = np.stack([np.cos((i % 12 + 1) * t + 0.1 * i)
                         for i in range(A.shape[0])], axis=1)
    for name, X in [("A @ random", D), ("A @ smooth", D_smooth)]:
        Y_dev = np.asarray(mm(dA, jnp.asarray(X)))
        Y_host = A @ X
        s = np.abs(Y_host).max()
        e = np.abs(Y_dev - Y_host).max()
        print(f"{name:16s} abs err {e:.2e}  (scale {s:.1e}, rel {e/s:.2e})")

    # 3. kernel matVEC (known-bad shape) via matmul vs multiply+reduce
    q = np.sin(3 * t) + 0.3 * np.cos(7 * t)
    y_host = A @ q
    y_mm = np.asarray(mm(dA, jnp.asarray(q)))
    from ipde_tpu.ops.kernels import kernel_matvec
    y_kv = np.asarray(jax.jit(kernel_matvec)(dA, jnp.asarray(q)))
    print(f"matvec via matmul  abs err {np.abs(y_mm - y_host).max():.2e}")
    print(f"matvec via mul+red abs err {np.abs(y_kv - y_host).max():.2e}")

    # 4. chain: G chol on host, then device triangular-ish compose
    L = np.linalg.cholesky(G_host + 1e-10 * scale * np.eye(G_host.shape[0]))
    Li = np.linalg.inv(L)
    Q_host = B @ Li.T
    Q_dev = np.asarray(mm(dB, jnp.asarray(Li.T)))
    e = np.abs(Q_dev - Q_host).max()
    print(f"Q = B Linv^T      abs err {e:.2e} (scale {np.abs(Q_host).max():.1e})")


if __name__ == "__main__":
    main()
