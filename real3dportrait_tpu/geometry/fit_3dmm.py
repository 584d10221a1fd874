"""3DMM coefficient fitting by gradient descent on landmark reprojection.

JAX redesign of the reference's Adam-based landmark fitting
(`data_gen/utils/process_image/fit_3dmm_landmark.py:85` for single images,
`data_gen/utils/process_video/fit_3dmm_landmark.py:131` for videos with
temporal regularization): the whole optimization is one `lax.scan` of optax
Adam steps inside jit — no per-iteration host round trips.

Losses: 2D landmark MSE (normalized image frame) + L2 priors on id/exp +
velocity/laplacian smoothness over time (video mode).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from real3dportrait_tpu.geometry import face3d_helper
from real3dportrait_tpu.geometry.bfm import BFMAssets


class FitResult(NamedTuple):
    id: jnp.ndarray      # [1, 80] (shared across frames)
    exp: jnp.ndarray     # [T, 64]
    euler: jnp.ndarray   # [T, 3]
    trans: jnp.ndarray   # [T, 3]
    loss: jnp.ndarray    # final scalar loss


def _reproject(assets: BFMAssets, idc, expc, euler, trans):
    t = expc.shape[0]
    id_rep = jnp.broadcast_to(idc, (t, idc.shape[-1]))
    return face3d_helper.reconstruct_lm2d(assets, id_rep, expc, euler, trans)


def fit_coeffs(
    assets: BFMAssets,
    lm2d: jnp.ndarray,            # [T, K, 2] normalized [0,1] landmarks
    n_pose_iters: int = 200,
    n_joint_iters: int = 200,
    lr: float = 0.05,
    lambda_reg_id: float = 3e-4,
    lambda_reg_exp: float = 3e-4,
    lambda_vel: float = 1e-2,
    lambda_lap: float = 1e-2,
) -> FitResult:
    """Fit (id, exp, euler, trans) to 2D landmarks.

    Two phases like the reference: pose-only (euler/trans) warmup, then joint
    optimization of all coefficients.
    """
    t = lm2d.shape[0]
    params = {
        "id": jnp.zeros((1, 80)),
        "exp": jnp.zeros((t, 64)),
        "euler": jnp.zeros((t, 3)),
        "trans": jnp.zeros((t, 3)),
    }

    def loss_fn(p):
        pred = _reproject(assets, p["id"], p["exp"], p["euler"], p["trans"])
        lm_loss = jnp.mean(jnp.square(pred - lm2d))
        reg = (
            lambda_reg_id * jnp.mean(jnp.square(p["id"]))
            + lambda_reg_exp * jnp.mean(jnp.square(p["exp"]))
        )
        smooth = 0.0
        if t > 2:
            for k in ("exp", "euler", "trans"):
                v = p[k]
                smooth = smooth + lambda_vel * jnp.mean(jnp.square(v[1:] - v[:-1]))
                smooth = smooth + lambda_lap * jnp.mean(
                    jnp.square(v[:-2] - 2 * v[1:-1] + v[2:])
                )
        return lm_loss + reg + smooth

    opt = optax.adam(lr)

    def phase(params, n_iters, trainable):
        opt_state = opt.init(params)

        def step(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            grads = {k: (g if k in trainable else jnp.zeros_like(g))
                     for k, g in grads.items()}
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                           length=n_iters)
        return params, losses[-1]

    params, _ = phase(params, n_pose_iters, trainable=("euler", "trans"))
    params, final_loss = phase(params, n_joint_iters,
                               trainable=("id", "exp", "euler", "trans"))
    return FitResult(params["id"], params["exp"], params["euler"],
                     params["trans"], final_loss)


fit_coeffs_jit = jax.jit(
    fit_coeffs,
    static_argnames=("n_pose_iters", "n_joint_iters", "lr", "lambda_reg_id",
                     "lambda_reg_exp", "lambda_vel", "lambda_lap"),
)
