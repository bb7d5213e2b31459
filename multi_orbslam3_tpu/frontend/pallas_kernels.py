"""Hand-written Pallas TPU kernels for the frontend hot ops.

Two ops dominate the per-frame compute (SURVEY.md §3.1 hot path):

1. FAST-9/16 corner scoring + 3x3 NMS (reference
   ORBextractor::ComputeKeyPointsOctTree, src/ORBextractor.cc:763-878).
   The jnp formulation (frontend/fast.py) materializes 16 shifted copies
   of each pyramid level in HBM; this kernel streams row-slabs through
   VMEM once, computing all 16 circle offsets from an in-register halo —
   1 read + 1 write of the image instead of ~20.
2. Packed-256-bit Hamming distance matrices (reference
   ORBmatcher::DescriptorDistance, src/ORBmatcher.cc:2358). The kernel
   tiles both descriptor sets through VMEM and accumulates
   popcount(xor) per 32-bit word on the VPU.

Both have jnp fallbacks (fast.py / matcher.py) used on CPU test meshes;
`use_pallas()` gates dispatch on the backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_orbslam3_tpu.frontend.fast import _CIRCLE, ARC_LEN

_HALO = 4          # 3 px Bresenham circle + 1 px NMS neighborhood
_LANE = 128


@functools.lru_cache(maxsize=1)
def use_pallas() -> bool:
    import os
    if os.environ.get("MO3_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ----------------------------------------------------------------------
# FAST score + NMS
# ----------------------------------------------------------------------

def _fast_nms_kernel(img_hbm, out_ref, slab_ref, sem, *, tile_h: int,
                     threshold: float, h: int, w: int):
    """Overlapping row-slab (tile_h + 2*_HALO, W) DMA'd from HBM ->
    out block (tile_h, W). Blocks of a BlockSpec cannot overlap, so the
    halo'd slab is fetched manually per program.
    """
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * _HALO), :],
        slab_ref, sem)
    dma.start()
    dma.wait()
    slab = slab_ref[:]                        # (tile_h + 8, W)

    def score_rows(r0, nrows):
        # corner score for slab rows [r0, r0 + nrows) (slab coordinates)
        center = slab[r0:r0 + nrows, :]
        diffs = []
        for (dx, dy) in _CIRCLE:
            sh = slab[r0 + dy:r0 + dy + nrows, :]
            if dx:
                sh = pltpu.roll(sh, (-dx) % sh.shape[1], axis=1)
            diffs.append(sh - center)
        ring = diffs + diffs[:ARC_LEN - 1]
        min_b = None
        min_d = None
        for start in range(16):
            arc_b = ring[start]
            arc_d = -ring[start]
            for k in range(1, ARC_LEN):
                arc_b = jnp.minimum(arc_b, ring[start + k])
                arc_d = jnp.minimum(arc_d, -ring[start + k])
            min_b = arc_b if min_b is None else jnp.maximum(min_b, arc_b)
            min_d = arc_d if min_d is None else jnp.maximum(min_d, arc_d)
        score = jnp.maximum(min_b, min_d)
        return jnp.where(score > threshold, score, 0.0)

    # scores for the tile and its 1-row aprons (needed by NMS)
    s = score_rows(_HALO - 1, tile_h + 2)     # rows: tile rows -1 .. +tile_h
    # zero the 3-px image border BEFORE NMS (the reference's fast_score
    # does; border scores must not suppress interior corners)
    row0 = pl.program_id(0) * tile_h - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where((rows < 3) | (rows >= h - 3)
                  | (cols < 3) | (cols >= w - 3), 0.0, s)
    center = s[1:1 + tile_h, :]
    earlier = None
    later = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = s[1 + dy:1 + dy + tile_h, :]
            if dx:
                n = pltpu.roll(n, (-dx) % n.shape[1], axis=1)
            if (dy, dx) < (0, 0):
                earlier = n if earlier is None else jnp.maximum(earlier, n)
            else:
                later = n if later is None else jnp.maximum(later, n)
    keep = (center > earlier) & (center >= later)
    out_ref[:] = jnp.where(keep, center, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score_nms(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Fused FAST corner score + 3x3 NMS via Pallas. img: (H, W) float32.

    Matches fast.nms3x3(fast.fast_score(img, threshold)) with the border
    zeroing the callers apply afterwards.
    """
    h, w = img.shape
    wp = _round_up(w, _LANE)
    tile_h = 64 if h >= 64 else _round_up(h, 8)
    hp = _round_up(h, tile_h)
    padded = jnp.zeros((hp + 2 * _HALO, wp), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (_HALO, 0))
    grid = (hp // tile_h,)
    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, tile_h=tile_h,
                          threshold=float(threshold), h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((hp, wp), img.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile_h, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, wp), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(padded)
    score = out[:h, :w]
    # zero the 3-px border (circle sampled zero padding there)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    border = (ys < 3) | (ys >= h - 3) | (xs < 3) | (xs >= w - 3)
    return jnp.where(border, 0.0, score)


# ----------------------------------------------------------------------
# Packed Hamming distance matrix
# ----------------------------------------------------------------------

_DTILE = 128


def _hamming_kernel(d1_ref, d2_ref, out_ref):
    """d1 block: (_DTILE, 8) x d2 block: (_DTILE, 8) -> (_DTILE, _DTILE)."""
    acc = jnp.zeros((_DTILE, _DTILE), jnp.int32)
    for wword in range(8):
        a = d1_ref[:, wword][:, None]         # (T, 1)
        b = d2_ref[:, wword][None, :]         # (1, T)
        acc = acc + jax.lax.population_count(
            jnp.bitwise_xor(a, b)).astype(jnp.int32)
    out_ref[:] = acc


@jax.jit
def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) packed uint32 -> (N, M) int32 Hamming distances,
    tiled through VMEM. Padding rows produce distance 0 (callers mask)."""
    n, m = d1.shape[0], d2.shape[0]
    npad = _round_up(n, _DTILE)
    mpad = _round_up(m, _DTILE)
    d1p = jnp.zeros((npad, 8), jnp.uint32).at[:n].set(d1)
    d2p = jnp.zeros((mpad, 8), jnp.uint32).at[:m].set(d2)
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((npad, mpad), jnp.int32),
        grid=(npad // _DTILE, mpad // _DTILE),
        in_specs=[
            pl.BlockSpec((_DTILE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DTILE, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_DTILE, _DTILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(d1p, d2p)
    return out[:n, :m]
