"""Sim(3) estimation from 3D-3D correspondences: batched Horn + RANSAC.

Replaces the reference Sim3Solver (src/Sim3Solver.cc — RANSAC over
3-point Horn closed forms with reprojection inlier checks). TPU
formulation: all hypotheses evaluated in one vmapped batch (no sequential
early-exit; the fixed batch is the budget), followed by IRLS-weighted
Horn refinement on the inlier set.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multi_orbslam3_tpu.geometry import sim3
from multi_orbslam3_tpu.geometry.sim3 import Sim3


def horn_sim3(p: jnp.ndarray, q: jnp.ndarray,
              w: jnp.ndarray | None = None,
              fix_scale: bool = False) -> Sim3:
    """Closed-form similarity q ~ s R p + t (Horn/Umeyama).
    p, q: (..., M, 3); w: optional (..., M) weights. Batched over leading
    axes."""
    if w is None:
        w = jnp.ones(p.shape[:-1], p.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-9
    wn = w / wsum
    mu_p = jnp.sum(wn[..., None] * p, axis=-2)
    mu_q = jnp.sum(wn[..., None] * q, axis=-2)
    pc = p - mu_p[..., None, :]
    qc = q - mu_q[..., None, :]
    cov = jnp.einsum("...m,...mi,...mj->...ij", wn, qc, pc)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones(cov.shape[:-2] + (3,)).at[..., 2].set(jnp.sign(det + 1e-12))
    R = U @ (S[..., :, None] * Vt)
    var_p = jnp.einsum("...m,...mi,...mi->...", wn, pc, pc)
    s = jnp.where(
        jnp.asarray(fix_scale),
        jnp.ones_like(var_p),
        jnp.sum(D * S, axis=-1) / (var_p + 1e-12))
    t = mu_q - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_p)
    return Sim3(R, t, s)


class Sim3RansacResult(NamedTuple):
    S: Sim3                 # best q <- p similarity
    inliers: jnp.ndarray    # (M,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray         # () bool


@functools.partial(jax.jit,
                   static_argnames=("n_hyp", "min_inliers", "fix_scale",
                                    "refine_iters"))
def sim3_ransac(p: jnp.ndarray, q: jnp.ndarray, valid: jnp.ndarray,
                key: jnp.ndarray, n_hyp: int = 128,
                inlier_th: float = 0.1, min_inliers: int = 20,
                fix_scale: bool = False,
                refine_iters: int = 4) -> Sim3RansacResult:
    """p, q: (M, 3) corresponding 3D points (candidate-map and current-map
    coordinates); inlier_th is a 3D distance in q's scale (callers pass a
    fraction of the local scene depth)."""
    M = p.shape[0]
    w = valid.astype(jnp.float32)
    probs = w / jnp.maximum(jnp.sum(w), 1e-9)
    idx = jax.vmap(lambda k: jax.random.choice(k, M, (3,), replace=False,
                                               p=probs))(
        jax.random.split(key, n_hyp))                      # (n_hyp, 3)
    S_h = horn_sim3(p[idx], q[idx], fix_scale=fix_scale)    # batched Sim3
    err = jnp.linalg.norm(
        sim3.apply(Sim3(S_h.R[:, None], S_h.t[:, None], S_h.s[:, None]),
                   p[None, :, :]) - q[None, :, :], axis=-1)  # (n_hyp, M)
    inl = (err < inlier_th) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    inliers = inl[best]

    # IRLS refinement: weighted Horn on (soft) inliers
    def body(_, carry):
        S_cur, _ = carry
        e = jnp.linalg.norm(sim3.apply(S_cur, p) - q, axis=-1)
        wgt = jnp.where(valid & (e < inlier_th * 1.5), 1.0, 0.0)
        S_new = horn_sim3(p, q, wgt, fix_scale=fix_scale)
        return S_new, wgt > 0

    S0 = Sim3(S_h.R[best], S_h.t[best], S_h.s[best])
    S_f, inl_f = jax.lax.fori_loop(0, refine_iters, body, (S0, inliers))
    n_in = jnp.sum(inl_f.astype(jnp.int32))
    return Sim3RansacResult(S=S_f, inliers=inl_f, n_inliers=n_in,
                            ok=n_in >= min_inliers)
