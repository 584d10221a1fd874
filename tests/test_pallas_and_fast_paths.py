import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.rendering.renderer import (
    _merge_sorted_samples,
    _unify_samples,
)


def _sorted_depths(key, b, m, s):
    return jnp.sort(jax.random.uniform(key, (b, m, s, 1), minval=2.0, maxval=3.0),
                    axis=-2)


def test_merge_sorted_matches_argsort():
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    b, m, s1, s2, c = 2, 5, 8, 6, 4
    d1 = _sorted_depths(k1, b, m, s1)
    d2 = _sorted_depths(k2, b, m, s2)
    c1 = jax.random.normal(k3, (b, m, s1, c))
    c2 = jax.random.normal(k4, (b, m, s2, c))
    s1d = jax.random.normal(k3, (b, m, s1, 1))
    s2d = jax.random.normal(k4, (b, m, s2, 1))

    ref = _unify_samples(d1, c1, s1d, d2, c2, s2d)
    fast = _merge_sorted_samples(d1, c1, s1d, d2, c2, s2d)
    for r, f in zip(ref, fast):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), atol=1e-6)


def test_merge_sorted_with_ties():
    d1 = jnp.array([[[[1.0], [2.0], [3.0]]]])
    d2 = jnp.array([[[[2.0], [4.0]]]])
    c1 = jnp.ones((1, 1, 3, 2))
    c2 = jnp.zeros((1, 1, 2, 2))
    s1 = jnp.ones((1, 1, 3, 1))
    s2 = jnp.zeros((1, 1, 2, 1))
    d, c, s = _merge_sorted_samples(d1, c1, s1, d2, c2, s2)
    np.testing.assert_array_equal(np.asarray(d[0, 0, :, 0]), [1, 2, 2, 3, 4])
    # depths stay sorted, all elements present
    assert np.all(np.diff(np.asarray(d[0, 0, :, 0])) >= 0)



def test_march_merged_fused_matches_unfused():
    """_march_merged (merge+march without materializing merged colors) must
    match march_rays over _merge_sorted_samples."""
    from real3dportrait_tpu.rendering.ray_marcher import march_rays
    from real3dportrait_tpu.rendering.renderer import _march_merged

    k = jax.random.PRNGKey(7)
    k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
    b, m, s1, s2, c = 2, 9, 10, 7, 6
    d1 = _sorted_depths(k1, b, m, s1)
    d2 = _sorted_depths(k2, b, m, s2)
    c1 = jax.random.uniform(k3, (b, m, s1, c))
    c2 = jax.random.uniform(k4, (b, m, s2, c))
    s1d = jax.random.normal(k5, (b, m, s1, 1))
    s2d = jax.random.normal(k6, (b, m, s2, 1))

    md, mc, ms = _merge_sorted_samples(d1, c1, s1d, d2, c2, s2d)
    for wb in (False, True):
        ref = march_rays(mc, ms, md, wb)
        got = _march_merged(d1, c1, s1d, d2, c2, s2d, wb)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-5, rtol=1e-5)
