"""Oriented BRIEF-256 descriptors + intensity-centroid orientation.

Replaces the reference's IC_Angle + computeOrbDescriptor
(src/ORBextractor.cc:75-144). Differences by design:

- The BRIEF sampling pattern is *generated* (seeded Gaussian pairs, the
  original BRIEF-paper recipe) instead of the hard-coded learned table —
  the engine is self-consistent end-to-end so cross-compatibility with
  OpenCV descriptors is not needed, and this avoids copying the 1024-entry
  constant table.
- All keypoints are processed as one batch: patch gathers are vmapped
  dynamic slices; descriptor bits are packed into (N, 8) uint32 so Hamming
  distance is XOR + population_count on 32-bit lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15            # orientation circle radius (reference HALF_PATCH_SIZE)
PATCH = 2 * HALF_PATCH + 1
N_BITS = 256
DESC_WORDS = 8             # 256 bits as 8 x uint32
_PATTERN_SEED = 20260817   # fixed so descriptors are stable across runs


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 2, 2) int32: per bit, two (x, y) offsets in [-13, 13].

    Gaussian(0, patch/5) sampling per the BRIEF paper; radius clipped so a
    rotation by any angle stays inside the 31x31 patch guard band used by
    the extractor's edge margin.
    """
    rng = np.random.RandomState(_PATTERN_SEED)
    sigma = PATCH / 5.0
    pts = rng.randn(N_BITS, 2, 2) * sigma
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    max_r = 13.0
    scale = np.where(norm > max_r, max_r / (norm + 1e-9), 1.0)
    return np.round(pts * scale).astype(np.int32)


@functools.lru_cache(maxsize=1)
def _circular_mask() -> np.ndarray:
    """(PATCH, PATCH) float mask of the orientation circle (umax table analog,
    reference ORBextractor.cc ctor :455-474)."""
    ys, xs = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    return ((xs * xs + ys * ys) <= HALF_PATCH * HALF_PATCH).astype(np.float32)


def gather_patches(img: jnp.ndarray, uv: jnp.ndarray, half: int) -> jnp.ndarray:
    """Gather (2*half+1)^2 patches around integer keypoint coords.

    img: (H, W); uv: (N, 2) float pixel coords -> (N, P, P).
    Coordinates are clamped so out-of-range keypoints (padding slots)
    return valid (if meaningless) data — masked downstream.
    """
    h, w = img.shape
    size = 2 * half + 1
    y0 = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32) - half, 0, h - size)
    x0 = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32) - half, 0, w - size)

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (size, size))

    return jax.vmap(one)(y0, x0)


def ic_angle(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (reference IC_Angle,
    src/ORBextractor.cc:75-104). (N, 2) -> (N,) radians."""
    patches = gather_patches(img, uv, HALF_PATCH)  # (N, P, P)
    mask = jnp.asarray(_circular_mask())
    coords = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.float32)
    m10 = jnp.einsum("npq,q,pq->n", patches, coords, mask)
    m01 = jnp.einsum("npq,p,pq->n", patches, coords, mask)
    return jnp.arctan2(m01, m10)


def compute_descriptors(img_blur: jnp.ndarray, uv: jnp.ndarray,
                        angle: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF-256: (N, 2) keypoints + (N,) angles -> (N, 8) uint32.

    Samples the blurred image at pattern offsets rotated by each keypoint's
    orientation (nearest-neighbor, like the reference's integer rounding).
    """
    h, w = img_blur.shape
    pat = jnp.asarray(brief_pattern(), dtype=jnp.float32)  # (256, 2, 2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)                # (N,)
    # rotate pattern offsets: (N, 256, 2pts, 2xy)
    px = pat[None, :, :, 0]
    py = pat[None, :, :, 1]
    rx = ca[:, None, None] * px - sa[:, None, None] * py
    ry = sa[:, None, None] * px + ca[:, None, None] * py
    sx = jnp.clip(jnp.round(uv[:, 0, None, None] + rx), 0, w - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(uv[:, 1, None, None] + ry), 0, h - 1).astype(jnp.int32)
    vals = img_blur[sy, sx]                                # (N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
    # pack into 8 words of 32 bits
    bits = bits.reshape(bits.shape[0], DESC_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
