"""Generator evaluation: FID / KID / IS machinery with a metric registry.

Redesign of `modules/eg3ds/metrics/{metric_main,metric_utils,frechet_inception_distance,
kernel_inception_distance,inception_score}.py`: the statistics math (Frechet
distance, polynomial-kernel MMD, KL-based IS) is extractor-agnostic and
implemented exactly; the feature extractor is pluggable.

The reference downloads a pretrained InceptionV3 from torch hub — impossible
in this zero-egress image — so the default extractor is a fixed
random-projection conv net (deterministic, scale-stable). Scores computed
with it are internally comparable across checkpoints of the same run, and
swapping in real Inception weights via ``extractor`` recovers standard
FID/KID/IS.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

_METRICS: dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    """Decorator registry (`metric_main.py:31`)."""
    _METRICS[fn.__name__] = fn
    return fn


def list_metrics() -> list[str]:
    return sorted(_METRICS)


def calc_metric(name: str, **kwargs) -> dict:
    """Run a registered metric (`metric_main.py:calc_metric`).

    The payload carries ``extractor`` provenance: feature-based scores
    (fid/kid/pr) computed with the random-projection fallback are internally
    consistent for A/B comparison but NOT comparable to published
    Inception-V3 numbers — the flag makes that machine-readable instead of a
    docstring footnote.
    """
    if name not in _METRICS:
        raise KeyError(f"unknown metric {name!r}; known: {list_metrics()}")
    value = _METRICS[name](**kwargs)
    out = {"results": {name: value}, "metric": name}
    if name in ("fid", "kid", "pr50k"):
        custom = kwargs.get("extractor") is not None
        out["extractor"] = "custom" if custom else "random_projection"
        out["comparable_to_published"] = bool(custom)
    return out


# --- statistics -------------------------------------------------------------


def _matrix_sqrt_eig(mat: np.ndarray) -> np.ndarray:
    """PSD matrix square root via symmetric eigendecomposition."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two feature sets [N,D], [M,D]
    (`frechet_inception_distance.py`)."""
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False)
    cov_b = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b
    # tr(Ca + Cb - 2 (Ca Cb)^(1/2)); use eig-based sqrt of the product via
    # the similarity trick sqrt(Ca Cb) ~ sqrt(Ca)^T is not symmetric —
    # compute sqrt(sqrt(Ca) Cb sqrt(Ca)) which shares the trace.
    sqrt_a = _matrix_sqrt_eig(cov_a)
    inner = _matrix_sqrt_eig(sqrt_a @ cov_b @ sqrt_a)
    return float(diff @ diff + np.trace(cov_a) + np.trace(cov_b) - 2 * np.trace(inner))


def kernel_distance(feats_a: np.ndarray, feats_b: np.ndarray,
                    max_subset_size: int = 1000, num_subsets: int = 10,
                    seed: int = 0) -> float:
    """KID: polynomial-kernel MMD^2, subset-averaged
    (`kernel_inception_distance.py`)."""
    rng = np.random.RandomState(seed)
    n = feats_a.shape[1]
    m = min(min(len(feats_a), len(feats_b)), max_subset_size)
    total = 0.0
    for _ in range(num_subsets):
        x = feats_a[rng.choice(len(feats_a), m, replace=False)].astype(np.float64)
        y = feats_b[rng.choice(len(feats_b), m, replace=False)].astype(np.float64)
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        total += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(total / num_subsets / m)


def inception_score(probs: np.ndarray, num_splits: int = 10) -> tuple[float, float]:
    """IS over class probabilities [N,C] (`inception_score.py`)."""
    scores = []
    n = len(probs)
    for i in range(num_splits):
        part = probs[i * n // num_splits : (i + 1) * n // num_splits]
        kl = part * (np.log(part + 1e-12) - np.log(part.mean(0, keepdims=True) + 1e-12))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


# --- default feature extractor ------------------------------------------------


def make_random_projection_extractor(feature_dim: int = 512, seed: int = 0,
                                     batch: int = 32) -> Callable:
    """Deterministic conv random-feature extractor: images [N,H,W,3] in
    [-1,1] -> features [N, feature_dim]."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (5, 5, 3, 32)) / np.sqrt(75)
    w2 = jax.random.normal(k2, (3, 3, 32, 64)) / np.sqrt(288)
    w_out = jax.random.normal(k3, (64 * 2, feature_dim)) / np.sqrt(128)

    @jax.jit
    def features(x):
        from jax import lax

        def conv(x, w, stride):
            return lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        h = jax.nn.leaky_relu(conv(x, w1, 4), 0.2)
        h = jax.nn.leaky_relu(conv(h, w2, 4), 0.2)
        pooled = jnp.concatenate([h.mean(axis=(1, 2)), h.max(axis=(1, 2))], -1)
        return pooled @ w_out

    def extract(images: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(images), batch):
            outs.append(np.asarray(features(jnp.asarray(images[i : i + batch]))))
        return np.concatenate(outs, 0)

    return extract


def make_inception_extractor(weights_path: str, batch: int = 16) -> Callable | None:
    """InceptionV3 pool-feature extractor from a ``convert_inception``
    msgpack tree (pytorch-fid convention) — the comparable-FID path.
    None when the weight file is absent (zero-egress image default)."""
    from real3dportrait_tpu.metrics.inception import (
        inception_pool_features, load_inception_params,
    )

    params = load_inception_params(weights_path)
    if params is None:
        return None
    fn = jax.jit(lambda imgs: inception_pool_features(params, imgs))

    def extract(images: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(images), batch):
            outs.append(np.asarray(fn(jnp.asarray(images[i : i + batch]))))
        return np.concatenate(outs, 0)

    return extract


def resolve_extractor(cfg=None) -> tuple[Callable, str]:
    """(extractor, kind): Inception when ``cfg['inception_ckpt']`` weights
    exist, else the random-projection fallback. The kind string must be
    recorded next to any reported score."""
    cfg = cfg or {}
    inc = make_inception_extractor(str(cfg.get("inception_ckpt", "") or ""))
    if inc is not None:
        return inc, "inception_v3"
    return make_random_projection_extractor(), "random_projection"


# --- registered metrics -------------------------------------------------------


@register_metric
def fid(real_images=None, fake_images=None, extractor=None, **_) -> float:
    extractor = extractor or make_random_projection_extractor()
    return frechet_distance(extractor(real_images), extractor(fake_images))


@register_metric
def kid(real_images=None, fake_images=None, extractor=None, **kw) -> float:
    extractor = extractor or make_random_projection_extractor()
    return kernel_distance(extractor(real_images), extractor(fake_images),
                           max_subset_size=kw.get("max_subset_size", 1000),
                           num_subsets=kw.get("num_subsets", 10))


def precision_recall(real_feats: np.ndarray, fake_feats: np.ndarray,
                     nhood_size: int = 3) -> tuple[float, float]:
    """Improved precision/recall (Kynkäänniemi et al.): a sample counts if it
    falls inside the k-NN hypersphere of the other manifold
    (`metrics/precision_recall.py` in the reference suite)."""

    def manifold_radii(feats):
        d = np.linalg.norm(feats[:, None] - feats[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        return np.sort(d, axis=1)[:, nhood_size - 1]

    def coverage(samples, manifold, radii):
        d = np.linalg.norm(samples[:, None] - manifold[None], axis=-1)
        return float(np.mean(np.any(d <= radii[None], axis=1)))

    r_real = manifold_radii(real_feats)
    r_fake = manifold_radii(fake_feats)
    precision = coverage(fake_feats, real_feats, r_real)
    recall = coverage(real_feats, fake_feats, r_fake)
    return precision, recall


def perceptual_path_length(
    synth_fn, z_dim: int, n_samples: int = 64, epsilon: float = 1e-4,
    seed: int = 0, distance_fn=None,
) -> float:
    """PPL (`metrics/perceptual_path_length.py`): expected squared perceptual
    distance between renders at z and slerp(z, z2, eps), scaled by 1/eps².

    ``synth_fn(z [N,z_dim]) -> images [N,H,W,3]``; ``distance_fn`` defaults to
    the LPIPS surrogate.
    """
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.metrics.image_metrics import lpips_surrogate

    distance_fn = distance_fn or (lambda a, b: lpips_surrogate(a, b))
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    z0 = jax.random.normal(k1, (n_samples, z_dim))
    z1 = jax.random.normal(k2, (n_samples, z_dim))
    t = jax.random.uniform(k3, (n_samples, 1))

    def slerp(a, b, tt):
        a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        omega = jnp.arccos(jnp.clip(jnp.sum(a_n * b_n, -1, keepdims=True), -1, 1))
        so = jnp.sin(omega)
        return (jnp.sin((1 - tt) * omega) / so) * a + (jnp.sin(tt * omega) / so) * b

    za = slerp(z0, z1, t)
    zb = slerp(z0, z1, t + epsilon)
    img_a = synth_fn(za)
    img_b = synth_fn(zb)
    d = np.asarray(distance_fn(img_a, img_b))
    return float(np.mean(d) / epsilon**2)


@register_metric
def pr50k(real_images=None, fake_images=None, extractor=None, **kw) -> dict:
    extractor = extractor or make_random_projection_extractor()
    p, r = precision_recall(extractor(real_images), extractor(fake_images),
                            nhood_size=kw.get("nhood_size", 3))
    return {"precision": p, "recall": r}


@register_metric
def ppl(synth_fn=None, z_dim: int = 512, **kw) -> float:
    return perceptual_path_length(synth_fn, z_dim,
                                  n_samples=kw.get("n_samples", 64),
                                  epsilon=kw.get("epsilon", 1e-4),
                                  seed=kw.get("seed", 0))
