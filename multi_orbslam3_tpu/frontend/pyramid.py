"""Image pyramid with fixed per-level shapes.

Reference: ORBextractor::ComputePyramid (src/ORBextractor.cc:408-474),
8 levels, scale factor 1.2. Level shapes are static Python ints so every
downstream kernel compiles once per level geometry.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(height: int, width: int, n_levels: int,
                 scale_factor: float) -> List[Tuple[int, int]]:
    shapes = []
    for lv in range(n_levels):
        s = scale_factor ** lv
        shapes.append((max(16, int(round(height / s))),
                       max(16, int(round(width / s)))))
    return shapes


def level_scales(n_levels: int, scale_factor: float) -> jnp.ndarray:
    return jnp.asarray([scale_factor ** lv for lv in range(n_levels)],
                       dtype=jnp.float32)


def _resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(img, out_hw, method="bilinear")


def build_pyramid(img: jnp.ndarray, n_levels: int,
                  scale_factor: float) -> List[jnp.ndarray]:
    """(H, W) float32 image -> list of n_levels images with static shapes.

    Cascaded resize (each level from the previous) like the reference, which
    also acts as mild anti-aliasing.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    out = [img]
    cur = img
    for lv in range(1, n_levels):
        cur = _resize_bilinear(cur, shapes[lv])
        out.append(cur)
    return out


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0,
                  radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur (reference blurs each level with 7x7 sigma=2
    before BRIEF sampling, ORBextractor.cc:1106-1110)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)

    def conv1d(a: jnp.ndarray, horizontal: bool) -> jnp.ndarray:
        pad = [(0, 0), (radius, radius)] if horizontal else [(radius, radius), (0, 0)]
        a = jnp.pad(a, pad, mode="edge")
        kern = k[None, None, None, :] if horizontal else k[None, None, :, None]
        out = jax.lax.conv_general_dilated(
            a[None, None], kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return out[0, 0]

    return conv1d(conv1d(img, True), False)
