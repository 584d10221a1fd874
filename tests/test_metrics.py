import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.metrics import (
    calc_metric,
    frechet_distance,
    inception_score,
    kernel_distance,
    lpips_surrogate,
    list_metrics,
    psnr,
    ssim,
)


def test_psnr_analytic():
    x = jnp.zeros((2, 8, 8, 3))
    assert float(psnr(x, x)[0]) > 100  # identical -> huge psnr
    y = x + 0.2  # mse = 0.04, psnr = 10*log10(4/0.04) = 20
    np.testing.assert_allclose(np.asarray(psnr(y, x)), 20.0, atol=1e-4)


def test_ssim_properties(rng):
    x = jax.random.uniform(rng, (2, 32, 32, 3), minval=-1, maxval=1)
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)
    noise = x + jax.random.normal(jax.random.PRNGKey(1), x.shape) * 0.5
    s = float(ssim(noise, x).mean())
    assert 0.0 < s < 0.9
    # more noise -> lower ssim
    worse = x + jax.random.normal(jax.random.PRNGKey(2), x.shape) * 1.5
    assert float(ssim(worse, x).mean()) < s


def test_lpips_surrogate_ordering(rng):
    x = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    d_same = float(lpips_surrogate(x, x).mean())
    d_noisy = float(lpips_surrogate(x + 0.3, x).mean())
    assert d_same < 1e-5 < d_noisy


def test_frechet_distance_analytic():
    rng = np.random.RandomState(0)
    a = rng.randn(2000, 8)
    b = rng.randn(2000, 8)
    # same distribution -> ~0
    assert frechet_distance(a, b) < 0.1
    # mean shift of m adds ~|m|^2
    c = b + 2.0
    d = frechet_distance(a, c)
    assert abs(d - 4.0 * 8) < 2.0


def test_kernel_distance_separates():
    rng = np.random.RandomState(0)
    a = rng.randn(600, 16)
    b = rng.randn(600, 16)
    near = kernel_distance(a, b, max_subset_size=300, num_subsets=4)
    far = kernel_distance(a, b + 1.5, max_subset_size=300, num_subsets=4)
    assert abs(near) < 0.5
    assert far > near + 1.0


def test_inception_score_bounds():
    rng = np.random.RandomState(0)
    # confident, diverse predictions -> high IS
    n, c = 500, 10
    onehot = np.eye(c)[rng.randint(0, c, n)] * 0.99 + 0.001
    onehot /= onehot.sum(1, keepdims=True)
    hi, _ = inception_score(onehot, num_splits=5)
    # uniform predictions -> IS ~ 1
    uniform = np.full((n, c), 1.0 / c)
    lo, _ = inception_score(uniform, num_splits=5)
    assert lo == pytest.approx(1.0, abs=1e-3)
    assert hi > 5.0


def test_metric_registry(rng):
    assert "fid" in list_metrics() and "kid" in list_metrics()
    real = np.asarray(jax.random.uniform(rng, (64, 32, 32, 3), minval=-1, maxval=1))
    fake_same = real + np.random.RandomState(0).randn(*real.shape).astype(np.float32) * 0.01
    fake_diff = -real
    r_same = calc_metric("fid", real_images=real, fake_images=fake_same)
    r_diff = calc_metric("fid", real_images=real, fake_images=fake_diff)
    assert r_same["results"]["fid"] < r_diff["results"]["fid"]
    with pytest.raises(KeyError):
        calc_metric("nope")
