"""FAST-9/16 corner detection with per-cell budgets, fully vectorized.

TPU-native replacement for the reference's FastGrid
(/root/reference/scavislam/fast_grid.{h,cpp}): the reference runs OpenCV FAST
repeatedly per grid cell, nudging each cell's threshold +-1/+-2 toward a
target corner count (fast_grid.cpp:86-152), then inserts detections into a
quadtree whose randomized breadth-balanced iterator yields spatially uniform
corners (quadtree.h:163-341).

The TPU formulation computes the SAME spatial-uniformity outcome in one shot:
- the FAST-9 corner test and a contrast score are evaluated for EVERY pixel as
  pure vector ops over 16 rolled copies of the image (VPU work, no loops);
- 3x3 non-max suppression;
- the image is split into a fixed grid and the TOP-K corners per cell are
  selected by score (one static top_k per cell) — replacing both the
  per-cell threshold retry loop and the quadtree EquiIter with a
  deterministic, shape-static selection.

Outputs are padded fixed-shape arrays + valid masks (jit-friendly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (the FAST-16 ring), (du, dv) offsets.
_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1),
        (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)
ARC_LEN = 9  # FAST-9


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Per-pixel FAST-9 corner response; 0 where not a corner.

    Score = max over the two polarities of (sum of |I_circle - I_p| - t over
    the contiguous arc), a SAD-style contrast measure (same ordering OpenCV
    uses for nonmax suppression).
    """
    h, w = img.shape
    # (16, H, W) ring values via rolls (XLA fuses these into one gather-ish op)
    ring = jnp.stack(
        [jnp.roll(img, (-int(dv), -int(du)), axis=(0, 1)) for du, dv in _CIRCLE],
        axis=0,
    )
    diff = ring - img[None, :, :]
    bright = diff > threshold
    dark = diff < -threshold

    def arc_all(mask):
        # does any length-9 circular window have all True?
        acc = mask
        for k in range(1, ARC_LEN):
            acc = acc & jnp.roll(mask, -k, axis=0)
        return jnp.any(acc, axis=0)

    is_corner = arc_all(bright) | arc_all(dark)

    # contrast score: sum of thresholded absolute differences
    score_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)

    # 3-pixel border invalid (ring reads wrap around via roll)
    vv = jnp.arange(h)[:, None]
    uu = jnp.arange(w)[None, :]
    interior = (vv >= 3) & (vv < h - 3) & (uu >= 3) & (uu < w - 3)
    return jnp.where(is_corner & interior, score, 0.0)


def nonmax_suppress_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep strict local maxima of the score map (8-neighborhood)."""
    neighborhood = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )
    return jnp.where(score >= neighborhood, score, 0.0)


@partial(jax.jit, static_argnames=("cells_y", "cells_x", "per_cell"))
def detect_corners_grid(
    img: jnp.ndarray,
    threshold: float = 10.0 / 255.0,
    cells_y: int = 6,
    cells_x: int = 8,
    per_cell: int = 32,
):
    """FAST-9 + NMS + per-cell top-K.

    Returns (uv (N, 2) float32, score (N,), valid (N,) bool) with
    N = cells_y * cells_x * per_cell, spatially uniform by construction.

    Parity surface: FastGrid::detectAdaptively (fast_grid.cpp:86-152) — the
    per-cell corner budget replaces the adaptive threshold retry loop.
    """
    h, w = img.shape
    score = nonmax_suppress_3x3(fast_score_map(img, threshold))

    ch = -(-h // cells_y)  # ceil
    cw = -(-w // cells_x)
    pad_h = ch * cells_y - h
    pad_w = cw * cells_x - w
    sp = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    cells = sp.reshape(cells_y, ch, cells_x, cw).transpose(0, 2, 1, 3)
    flat = cells.reshape(cells_y * cells_x, ch * cw)

    top_scores, top_idx = jax.lax.top_k(flat, per_cell)
    valid = top_scores > 0.0

    cell_ids = jnp.arange(cells_y * cells_x)[:, None]
    cy = cell_ids // cells_x
    cx = cell_ids % cells_x
    in_v = top_idx // cw
    in_u = top_idx % cw
    vs = (cy * ch + in_v).astype(jnp.float32)
    us = (cx * cw + in_u).astype(jnp.float32)

    uv = jnp.stack([us.reshape(-1), vs.reshape(-1)], axis=-1)
    return uv, top_scores.reshape(-1), valid.reshape(-1)


@partial(jax.jit, static_argnames=("cells_y", "cells_x", "per_cell"))
def corner_buckets(
    img: jnp.ndarray,
    threshold: float = 10.0 / 255.0,
    cells_y: int = 24,
    cells_x: int = 32,
    per_cell: int = 8,
):
    """Fine-grained bucketed corner index for guided matching.

    Same computation as :func:`detect_corners_grid` but organized as
    (cells_y, cells_x, per_cell) buckets so a matcher can gather the 3x3
    neighborhood of any predicted location in O(1) — the TPU replacement for
    the reference's quadtree window query (quadtree.h:679-710, used by
    matcher.cpp:351-357).

    Returns dict with "uv" (cy, cx, K, 2), "score" (cy, cx, K),
    "valid" (cy, cx, K), plus the static cell geometry.
    """
    uv, score, valid = detect_corners_grid(
        img, threshold, cells_y, cells_x, per_cell
    )
    return {
        "uv": uv.reshape(cells_y, cells_x, per_cell, 2),
        "score": score.reshape(cells_y, cells_x, per_cell),
        "valid": valid.reshape(cells_y, cells_x, per_cell),
    }


@partial(jax.jit, static_argnames=("cells_y", "cells_x", "per_cell"))
def corner_buckets_prefiltered(
    img: jnp.ndarray,
    threshold: float = 10.0 / 255.0,
    cells_y: int = 24,
    cells_x: int = 32,
    per_cell: int = 8,
):
    """:func:`corner_buckets` on the 3x3-binomial-smoothed image, fused into
    ONE device program. The backend's re-detection must mirror the frame
    step's sensor-noise prefilter (frontend_step.py) so re-detected corners
    equal the frontend's — but calling ``binomial3`` EAGERLY before the
    jitted ``corner_buckets`` dispatched ~7 device ops per call, and the
    backend runs it per level x per pass x per registration: measured as
    the 74 -> 6 fps collapse of the loop-closure benchmark over the TPU
    tunnel (BASELINE config 2)."""
    from scavislam_tpu.ops.image import binomial3

    return corner_buckets(
        binomial3(img), threshold, cells_y, cells_x, per_cell
    )
