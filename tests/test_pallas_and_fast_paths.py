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


def test_fused_osg_decoder_matches_module(rng):
    from real3dportrait_tpu.models.decoder import OSGDecoder
    from real3dportrait_tpu.ops.pallas import fused_osg_decoder

    hid, out_dim, c = 64, 32, 96
    dec = OSGDecoder(hidden_dim=hid, output_dim=out_dim)
    feats = jax.random.normal(rng, (2, 3, 300, c))
    variables = dec.init(jax.random.PRNGKey(0), feats)
    ref = dec.apply(variables, feats)

    p = variables["params"]
    # FullyConnectedLayer folds lr_mult/sqrt(fan_in) into the weight at call
    w0 = p["net0"]["weight"] * (1.0 / np.sqrt(c))
    b0 = p["net0"]["bias"]
    w1 = p["net1"]["weight"] * (1.0 / np.sqrt(hid))
    b1 = p["net1"]["bias"]
    out = fused_osg_decoder(feats, w0, b0, w1, b1, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["sigma"]), np.asarray(ref["sigma"]),
                               rtol=1e-4, atol=1e-5)


def test_fused_decoder_pads_ragged_m(rng):
    from real3dportrait_tpu.ops.pallas import fused_osg_decoder

    c, hid, out_dim = 16, 8, 4
    feats = jax.random.normal(rng, (1, 3, 100, c))  # 100 % 64 != 0
    w0 = jax.random.normal(jax.random.PRNGKey(1), (c, hid)) * 0.1
    b0 = jnp.zeros((hid,))
    w1 = jax.random.normal(jax.random.PRNGKey(2), (hid, 1 + out_dim)) * 0.1
    b1 = jnp.zeros((1 + out_dim,))
    out = fused_osg_decoder(feats, w0, b0, w1, b1, tile_m=64, interpret=True)
    assert out["rgb"].shape == (1, 100, out_dim)
    assert out["sigma"].shape == (1, 100, 1)
    assert bool(jnp.isfinite(out["rgb"]).all())
