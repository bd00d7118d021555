"""Global configuration for ipde_tpu.

The framework targets spectral accuracy (1e-10 .. 1e-14 relative error), which
requires float64 arithmetic.  On TPU, float64 elementwise ops and matmuls are
supported (software-emulated by XLA), but complex128 and float64 FFT/linalg
are NOT.  The design consequences, applied throughout the package:

  * all device arrays are real float64; complex data is carried as explicit
    (re, im) pairs (see ``ipde_tpu.ops.cx``),
  * Fourier transforms are implemented as f64 DFT matmuls (MXU-friendly at
    the sizes this framework needs) with a native-FFT fast path on backends
    that support complex128 (CPU),
  * dense factorizations (LU/inv/lstsq) of geometry-static operators happen
    once on the host in numpy; the device only ever applies precomputed
    matrices.

Reference parity: the reference package (dbstein/ipde) relies on MKL/numba
float64 throughout; see SURVEY.md section 2.
"""

from __future__ import annotations

import jax

# Enable x64 before anything else in the package touches jax.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Default floating point type for all device compute.
default_dtype = jnp.float64
default_np_dtype = np.float64


def backend_has_complex128() -> bool:
    """True when the active backend supports complex128 (CPU does, TPU not)."""
    return jax.default_backend() == "cpu"
