"""Monocular two-view bootstrap via batched essential-matrix RANSAC.

Replaces the reference's Initializer / TwoViewReconstruction
(src/TwoViewReconstruction.cc, invoked through
Pinhole::ReconstructWithTwoViews): instead of iterating H and F RANSAC in
two threads with data-dependent convergence, we evaluate a fixed batch of
8-point hypotheses in parallel (one SVD per hypothesis, vmapped), pick the
best by inlier count, refine on inliers, decompose E with the cheirality
test over the 4 (R, t) candidates, and triangulate. A pure-rotation /
planar degeneracy is reported through the result's quality fields and
handled by the caller (it simply waits for more parallax, which is also
what the reference's model-selection ends up doing on such frames).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multi_orbslam3_tpu.geometry import camera as cam
from multi_orbslam3_tpu.geometry import se3, triangulation


class InitResult(NamedTuple):
    ok: jnp.ndarray          # () bool — initialization accepted
    T_21: jnp.ndarray        # (4, 4) pose of view 2 in view-1 frame (unit baseline)
    points: jnp.ndarray      # (M, 3) triangulated landmarks in view-1 frame
    point_ok: jnp.ndarray    # (M,) bool valid triangulations
    inliers: jnp.ndarray     # (M,) bool epipolar inliers
    n_inliers: jnp.ndarray   # () int32


def _eight_point(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point algorithm on bearings: (8, 3) x (8, 3) -> E (3, 3).
    b are unit-plane bearings (x, y, 1) so the 'normalization' of pixel
    8-point is already done by K^-1."""
    x1, y1 = b1[:, 0], b1[:, 1]
    x2, y2 = b2[:, 0], b2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=1)       # (8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    # project onto the essential manifold: two equal singular values
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) * 0.5
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * s) @ Vt2


def _sampson_err(E: jnp.ndarray, b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error of b2^T E b1 on the unit plane."""
    Eb1 = b1 @ E.T           # (M, 3) = E b1
    Etb2 = b2 @ E            # (M, 3) = E^T b2
    num = jnp.sum(b2 * Eb1, axis=-1) ** 2
    den = Eb1[:, 0] ** 2 + Eb1[:, 1] ** 2 + Etb2[:, 0] ** 2 + Etb2[:, 1] ** 2
    return num / (den + 1e-12)


def _decompose_E(E: jnp.ndarray):
    """E -> 4 candidate (R, t) with |t| = 1."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def initialize_two_view(K: cam.PinholeK, uv1: jnp.ndarray, uv2: jnp.ndarray,
                        match_valid: jnp.ndarray, key: jnp.ndarray,
                        n_hyp: int = 192, inlier_th_px: float = 1.5,
                        min_inliers: int = 50,
                        min_parallax_cos: float = 0.99995) -> InitResult:
    """uv1/uv2: (M, 2) matched undistorted pixel coordinates; match_valid:
    (M,) mask. Returns unit-baseline relative pose + triangulated points.
    """
    M = uv1.shape[0]
    b1 = cam.unproject(K, uv1)
    b2 = cam.unproject(K, uv2)
    # pixel threshold -> unit-plane threshold (approx via focal length)
    f = (K.fx + K.fy) * 0.5
    th = (inlier_th_px / f) ** 2

    # --- hypothesis batch ---
    w = match_valid.astype(jnp.float32)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, M, (8,), replace=False, p=w / jnp.sum(w))
    )(jax.random.split(key, n_hyp))                     # (n_hyp, 8)
    Es = jax.vmap(lambda i: _eight_point(b1[i], b2[i]))(idx)
    errs = jax.vmap(lambda E: _sampson_err(E, b1, b2))(Es)   # (n_hyp, M)
    inl = (errs < th) & match_valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    inliers = inl[best]

    # --- refine on inliers (weighted DLT over all M with inlier weights) ---
    x1, y1 = b1[:, 0], b1[:, 1]
    x2, y2 = b2[:, 0], b2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=1)
    Aw = A * inliers[:, None]
    _, _, Vt = jnp.linalg.svd(Aw, full_matrices=False)
    E = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * (S[0] + S[1]) * 0.5) @ Vt2
    err_r = _sampson_err(E, b1, b2)
    inliers = (err_r < th) & match_valid

    # --- cheirality over 4 decompositions ---
    Rs, ts = _decompose_E(E)
    T1 = jnp.broadcast_to(se3.identity(), (M, 4, 4))

    def count_front(R, t):
        T2 = se3.make(R, t)
        p = triangulation.triangulate_dlt(
            T1, jnp.broadcast_to(T2, (M, 4, 4)), b1, b2)
        z1 = p[:, 2]
        z2 = triangulation.depth_in(jnp.broadcast_to(T2, (M, 4, 4)), p)
        good = (z1 > 1e-3) & (z2 > 1e-3) & inliers
        return jnp.sum(good), p, good

    counts, ps, goods = jax.vmap(count_front)(Rs, ts)
    pick = jnp.argmax(counts)
    R, t = Rs[pick], ts[pick]
    points = ps[pick]
    front = goods[pick]
    T21 = se3.make(R, t)

    # --- parallax / quality gates (reference CheckRT parallax test) ---
    cosp = triangulation.parallax_cos(
        T1, jnp.broadcast_to(T21, (M, 4, 4)), points)
    enough_par = jnp.sum((cosp < min_parallax_cos) & front) >= (min_inliers // 2)
    n_in = jnp.sum(front.astype(jnp.int32))
    dominant = counts[pick] > 0.7 * jnp.maximum(jnp.sum(inliers), 1)
    ok = (n_in >= min_inliers) & enough_par & dominant
    point_ok = front & (cosp < min_parallax_cos)
    return InitResult(ok=ok, T_21=T21, points=points, point_ok=point_ok,
                      inliers=inliers, n_inliers=n_in)
