"""Device special functions (trig reduction, Bessel J) vs scipy/numpy."""

import numpy as np

from ipde_tpu.ops.kernels import (_cos_poly, _sin_poly, _trig_reduce,
                                  accurate_cos, accurate_sin, bessel_j0,
                                  bessel_j1, bessel_j2)


def test_trig_reduction_polys():
    # On CPU accurate_sin == jnp.sin; test the reduction machinery directly.
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.uniform(-1e4, 1e4, 4000),
                        rng.uniform(-2, 2, 1000), [0.0, 1e-18, np.pi]])
    import jax.numpy as jnp
    r, q = _trig_reduce(jnp.asarray(x))
    r, q = np.asarray(r), np.asarray(q)
    s, c = np.asarray(_sin_poly(jnp.asarray(r))), \
        np.asarray(_cos_poly(jnp.asarray(r)))
    sin_rec = np.choose(q, [s, c, -s, -c])
    cos_rec = np.choose(q, [c, -s, -c, s])
    assert np.abs(sin_rec - np.sin(x)).max() < 5e-15
    assert np.abs(cos_rec - np.cos(x)).max() < 5e-15
    assert np.abs(np.asarray(accurate_sin(jnp.asarray(x))) - np.sin(x)).max() \
        < 5e-15


def test_bessel_j():
    from scipy.special import j0, j1, jv
    rng = np.random.default_rng(1)
    z = np.concatenate([rng.uniform(0, 4, 2000), rng.uniform(4, 40, 2000),
                        rng.uniform(40, 9000, 2000),
                        [0.0, 3.9999, 4.0, 40.0, 40.0001]])
    import jax.numpy as jnp
    zd = jnp.asarray(z)
    for fn, ref, nu in [(bessel_j0, j0, 0), (bessel_j1, j1, 1),
                        (bessel_j2, None, 2)]:
        want = ref(z) if ref is not None else jv(2, z)
        got = np.asarray(fn(zd))
        err = np.abs(got - want).max()
        assert err < 2e-14, (nu, err)
