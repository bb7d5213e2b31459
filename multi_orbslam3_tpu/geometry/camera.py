"""Camera models: pinhole (+ radtan distortion) and Kannala-Brandt fisheye.

Replaces reference src/CameraModels/Pinhole.cpp and KannalaBrandt8.cpp
(GeometricCamera interface, include/CameraModels/GeometricCamera.h:55-84).
All functions are batched over leading axes; projection Jacobians are the
analytic 2x3 d(uv)/d(p_cam) used by every optimizer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-8


class PinholeK(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def intrinsics_from_config(cam_cfg) -> PinholeK:
    f32 = jnp.float32
    return PinholeK(f32(cam_cfg.fx), f32(cam_cfg.fy), f32(cam_cfg.cx), f32(cam_cfg.cy))


def project(K: PinholeK, p_cam: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) camera-frame points -> (..., 2) pixels. No distortion
    (the pipeline undistorts keypoints once at extraction, like the
    reference Frame::UndistortKeyPoints src/Frame.cc:721)."""
    z = p_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = K.fx * p_cam[..., 0] * inv_z + K.cx
    v = K.fy * p_cam[..., 1] * inv_z + K.cy
    return jnp.stack([u, v], axis=-1)


def project_jacobian(K: PinholeK, p_cam: jnp.ndarray) -> jnp.ndarray:
    """d(uv)/d(p_cam): (..., 2, 3)."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([K.fx * inv_z, zero, -K.fx * x * inv_z2], axis=-1)
    row_v = jnp.stack([zero, K.fy * inv_z, -K.fy * y * inv_z2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def unproject(K: PinholeK, uv: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) pixels -> (..., 3) unit-depth bearing (x, y, 1)."""
    x = (uv[..., 0] - K.cx) / K.fx
    y = (uv[..., 1] - K.cy) / K.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def in_image(uv: jnp.ndarray, width: int, height: int,
             margin: float = 0.0) -> jnp.ndarray:
    return ((uv[..., 0] >= margin) & (uv[..., 0] < width - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < height - margin))


# ---------------------------------------------------------------------------
# Radial-tangential distortion (OpenCV model) — used once per frame to
# undistort extracted keypoints (iterative inverse).
# ---------------------------------------------------------------------------

def radtan_distort(norm_xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) normalized coords -> distorted normalized coords.
    dist = (k1, k2, p1, p2, k3)."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = norm_xy[..., 0], norm_xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def radtan_undistort(norm_xy: jnp.ndarray, dist: jnp.ndarray,
                     iters: int = 5) -> jnp.ndarray:
    """Iterative inverse of radtan_distort (fixed-point; 5 iters matches
    OpenCV's undistortPoints default accuracy at SLAM tolerances)."""
    x = norm_xy
    for _ in range(iters):
        d = radtan_distort(x, dist) - x
        x = norm_xy - d
    return x


def undistort_pixels(K: PinholeK, uv: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Undistort pixel keypoints (reference Frame::UndistortKeyPoints)."""
    norm = jnp.stack([(uv[..., 0] - K.cx) / K.fx,
                      (uv[..., 1] - K.cy) / K.fy], axis=-1)
    und = radtan_undistort(norm, dist)
    return jnp.stack([und[..., 0] * K.fx + K.cx,
                      und[..., 1] * K.fy + K.cy], axis=-1)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (equidistant fisheye, 4 coefficients) — reference
# src/CameraModels/KannalaBrandt8.cpp (TUM-VI 512 sequences).
# ---------------------------------------------------------------------------

def kb8_project(K: PinholeK, kb: jnp.ndarray, p_cam: jnp.ndarray) -> jnp.ndarray:
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    r = jnp.sqrt(x * x + y * y) + _EPS
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    theta_d = theta * (1.0 + kb[..., 0] * t2 + kb[..., 1] * t2 ** 2
                       + kb[..., 2] * t2 ** 3 + kb[..., 3] * t2 ** 4)
    scale = theta_d / r
    return jnp.stack([K.fx * scale * x + K.cx, K.fy * scale * y + K.cy], axis=-1)


def kb8_unproject(K: PinholeK, kb: jnp.ndarray, uv: jnp.ndarray,
                  iters: int = 8) -> jnp.ndarray:
    """Newton inversion of the theta polynomial -> unit-norm bearing."""
    mx = (uv[..., 0] - K.cx) / K.fx
    my = (uv[..., 1] - K.cy) / K.fy
    theta_d = jnp.sqrt(mx * mx + my * my) + _EPS
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + kb[..., 0] * t2 + kb[..., 1] * t2 ** 2
                     + kb[..., 2] * t2 ** 3 + kb[..., 3] * t2 ** 4) - theta_d
        df = (1.0 + 3.0 * kb[..., 0] * t2 + 5.0 * kb[..., 1] * t2 ** 2
              + 7.0 * kb[..., 2] * t2 ** 3 + 9.0 * kb[..., 3] * t2 ** 4)
        theta = theta - f / (df + _EPS)
    scale = jnp.tan(theta) / theta_d
    bearing = jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)
    return bearing


def kb8_project_jacobian(K: PinholeK, kb: jnp.ndarray,
                         p_cam: jnp.ndarray) -> jnp.ndarray:
    """Numerically safe analytic-ish Jacobian via forward-mode on the closed
    form — small (2x3), computed with explicit central differences would be
    wasteful; use jax.jacfwd at callsites if needed. Here: analytic."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2) + _EPS
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    poly = 1.0 + kb[..., 0] * t2 + kb[..., 1] * t2 ** 2 \
        + kb[..., 2] * t2 ** 3 + kb[..., 3] * t2 ** 4
    dpoly = 3.0 * kb[..., 0] * t2 + 5.0 * kb[..., 1] * t2 ** 2 \
        + 7.0 * kb[..., 2] * t2 ** 3 + 9.0 * kb[..., 3] * t2 ** 4 + 1.0
    theta_d = theta * poly
    norm2 = r2 + z * z
    # d theta / d(x,y,z)
    dth_dx = x * z / (norm2 * r)
    dth_dy = y * z / (norm2 * r)
    dth_dz = -r / norm2
    dthd_dth = dpoly
    s = theta_d / r
    ds_dx = (dthd_dth * dth_dx * r - theta_d * x / r) / r2
    ds_dy = (dthd_dth * dth_dy * r - theta_d * y / r) / r2
    ds_dz = dthd_dth * dth_dz / r
    du = jnp.stack([K.fx * (s + x * ds_dx), K.fx * x * ds_dy,
                    K.fx * x * ds_dz], axis=-1)
    dv = jnp.stack([K.fy * y * ds_dx, K.fy * (s + y * ds_dy),
                    K.fy * y * ds_dz], axis=-1)
    return jnp.stack([du, dv], axis=-2)
