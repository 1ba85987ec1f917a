"""Counter-based RNG: determinism, independence, distribution."""

import numpy as np
import jax.numpy as jnp

from raytrace_tpu import rng


def _ids(n, seed=0):
    pix = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.zeros(n, jnp.uint32)
    return pix, samp


def test_deterministic():
    pix, samp = _ids(1024)
    a = rng.uniform4(pix, samp, 7, 3)
    b = rng.uniform4(pix, samp, 7, 3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_streams_independent():
    pix, samp = _ids(1024)
    a = np.asarray(rng.uniform4(pix, samp, 1, 0)[0])
    b = np.asarray(rng.uniform4(pix, samp, 2, 0)[0])
    assert not np.allclose(a, b)
    # different seeds differ too
    c = np.asarray(rng.uniform4(pix, samp, 1, 99)[0])
    assert not np.allclose(a, c)


def test_uniform_distribution():
    pix, samp = _ids(1 << 16)
    u = np.concatenate([np.asarray(x) for x in rng.uniform4(pix, samp, 0, 0)])
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1.0 / 12.0) < 0.002
    # crude serial correlation check
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 0.02


def test_unit_ball():
    pix, samp = _ids(1 << 16)
    p = np.asarray(rng.unit_ball(pix, samp, 5, 0))
    r2 = (p ** 2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    # uniform ball moments: E[x]=0, E[r^2]=3/5
    assert np.abs(p.mean(0)).max() < 0.01
    assert abs(r2.mean() - 0.6) < 0.01
