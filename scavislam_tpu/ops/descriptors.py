"""Batched 128-D gradient-histogram descriptors (SURF-class) on device.

TPU-native replacement for the reference's SURF-128 descriptors
(/root/reference/scavislam/placerecognizer.cpp:206-246 uses cv::SURF with
threshold 600, 2 octaves, extended=128-D descriptors). OpenCV's SURF is
nonfree and scalar-loop-heavy; the idiomatic choice here (SURVEY.md §7 step 7)
is an upright SIFT-style descriptor — 4x4 spatial cells x 8 orientation bins
over a 16x16 gradient patch — computed for ALL keypoints at once with batched
bilinear gathers and one one-hot einsum for the histogram scatter (MXU work).

Descriptors are L2-normalized with SIFT's 0.2 clipping; matching and
bag-of-words quantization then reduce to a single descriptors @ vocab.T
matmul (see models.placerec).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.ops.image import bilinear_sample

DESC_DIM = 128
GRID = 4  # 4x4 spatial cells
BINS = 8  # orientation bins
SUPPORT = 16  # 16x16 sample grid

# the place-recognition keypoint budget (models.placerec.MAX_KEYPOINTS
# aliases this) and the column layout of one bow_describe row:
# [word | desc(128) | u v d | x y z | valid]
BOW_KEYPOINTS = 256
BOW_COLS = DESC_DIM + 8


def _sample_offsets(scale: float = 1.0):
    r = (np.arange(SUPPORT, dtype=np.float32) - (SUPPORT - 1) / 2.0) * scale
    ou, ov = np.meshgrid(r, r)
    return np.stack([ou.reshape(-1), ov.reshape(-1)], axis=-1)  # (256, 2)


def _cell_index():
    """Spatial cell id (0..15) for each of the 256 samples."""
    idx = np.arange(SUPPORT)
    cell = np.minimum(idx * GRID // SUPPORT, GRID - 1)
    cu, cv = np.meshgrid(cell, cell)
    return (cv * GRID + cu).reshape(-1)  # (256,)


# Gaussian weighting of the support window (SIFT sigma = half window)
def _gauss_weights():
    r = np.arange(SUPPORT, dtype=np.float32) - (SUPPORT - 1) / 2.0
    g = np.exp(-(r**2) / (2 * (SUPPORT / 2) ** 2))
    return np.outer(g, g).reshape(-1)


@partial(jax.jit, static_argnames=())
def compute_descriptors(
    dx_img: jnp.ndarray,
    dy_img: jnp.ndarray,
    uv: jnp.ndarray,  # (N, 2) keypoint centers, level-0 pixels
    scale: jnp.ndarray = None,  # (N,) sample spacing multiplier (default 1)
):
    """Compute (N, 128) descriptors. Returns (desc, valid)."""
    n = uv.shape[0]
    offs = jnp.asarray(_sample_offsets())  # (256, 2)
    if scale is None:
        scale = jnp.ones((n,), jnp.float32)
    coords = uv[:, None, :] + offs[None, :, :] * scale[:, None, None]
    gx, okx = bilinear_sample(dx_img, coords)
    gy, oky = bilinear_sample(dy_img, coords)
    valid = jnp.all(okx & oky, axis=-1)

    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    binf = (ang + jnp.pi) * (BINS / (2.0 * jnp.pi))  # [0, 8)
    b0 = jnp.floor(binf).astype(jnp.int32) % BINS
    b1 = (b0 + 1) % BINS
    w1 = binf - jnp.floor(binf)
    w0 = 1.0 - w1

    gw = jnp.asarray(_gauss_weights())[None, :]
    cell = jnp.asarray(_cell_index())[None, :]  # (1, 256)
    cell = jnp.broadcast_to(cell, (n, cell.shape[1]))

    # one-hot scatter: hist[n, cell*8+bin] += w * mag
    idx0 = cell * BINS + b0
    idx1 = cell * BINS + b1
    contrib0 = (mag * gw * w0)[:, :, None] * jax.nn.one_hot(idx0, DESC_DIM)
    contrib1 = (mag * gw * w1)[:, :, None] * jax.nn.one_hot(idx1, DESC_DIM)
    hist = jnp.sum(contrib0 + contrib1, axis=1)  # (N, 128)

    # SIFT normalization: L2 -> clip 0.2 -> L2
    norm = jnp.linalg.norm(hist, axis=-1, keepdims=True)
    hist = hist / jnp.maximum(norm, 1e-8)
    hist = jnp.minimum(hist, 0.2)
    norm = jnp.linalg.norm(hist, axis=-1, keepdims=True)
    hist = hist / jnp.maximum(norm, 1e-8)
    return hist, valid


def bow_describe(img, disp, vocab, cam_params, mono: bool = False):
    """The whole place-recognition describe pipeline (FAST corners ->
    disparity gate -> gradient descriptors -> back-projection -> BoW
    quantization) as pure traced ops, returning ONE packed (BOW_KEYPOINTS,
    BOW_COLS) array: [word | desc | u v d | x y z | valid] per row.

    Parity: PlaceRecognizer describe + quantize (/root/reference/scavislam/
    placerecognizer.cpp:130-152, 222-246). Called two ways: jitted standalone
    by models.placerec (the PR-thread path, relocalization) and INLINE from
    the fused keyframe-spawn program (models.frontend_step) so a keyframe's
    BoW data rides back in the spawn payload the frontend already fetches —
    a separate per-keyframe describe dispatch+fetch measured ~25-30 ms of
    tunnel time each at reference keyframe cadence.

    `mono=True` (trace-time branch) skips depth gating and back-projection
    (no right image): retrieval-only places whose geometric verification is
    delegated to the mono Sim3 machinery."""
    from scavislam_tpu.ops.fast import detect_corners_grid
    from scavislam_tpu.ops.image import nearest_sample, sobel_xy

    focal, ppx, ppy, baseline = cam_params
    uv, score, valid = detect_corners_grid(
        img, threshold=8.0 / 255.0, cells_y=8, cells_x=8,
        per_cell=BOW_KEYPOINTS // 64,
    )
    if mono:
        d = jnp.zeros_like(uv[:, 0])
    else:
        d, dok = nearest_sample(disp, uv)
        valid = valid & dok & (d > 0.5)
    dx, dy = sobel_xy(img)
    desc, desc_ok = compute_descriptors(dx, dy, uv)
    valid = valid & desc_ok
    if mono:
        xyz = jnp.zeros((uv.shape[0], 3), jnp.float32)
    else:
        ds = jnp.maximum(d, 0.5)
        z = focal * baseline / ds
        x = (uv[:, 0] - ppx) / focal * z
        y = (uv[:, 1] - ppy) / focal * z
        xyz = jnp.stack([x, y, z], axis=-1)
    words = jnp.argmax(
        jnp.einsum("nd,kd->nk", desc, vocab,
                   preferred_element_type=jnp.float32),
        axis=1,
    )
    uvd = jnp.stack([uv[:, 0], uv[:, 1], d], axis=-1)
    return jnp.concatenate([
        words.astype(jnp.float32)[:, None], desc, uvd, xyz,
        valid.astype(jnp.float32)[:, None],
    ], axis=1)


def match_descriptors(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                      ratio: float = 0.8,
                      valid_a: jnp.ndarray = None,
                      valid_b: jnp.ndarray = None):
    """Brute-force mutual matching with Lowe ratio test; one matmul.

    Returns (idx_b (Na,), valid (Na,)): best match in b for each a.
    (Parity surface: the BFMatcher step of the reference's geometric check,
    placerecognizer.cpp:174-202.)

    `valid_a`/`valid_b` support FIXED-CAPACITY padded descriptor tables
    (invalid rows excluded from matching): callers must pad rather than
    filter — a variable row count recompiles this program per distinct
    (Na, Nb) pair (measured 7-30 s per recompile over a remote link).
    """
    sim = jnp.einsum("nd,md->nm", desc_a, desc_b,
                     preferred_element_type=jnp.float32)
    if valid_b is not None:
        sim = jnp.where(valid_b[None, :], sim, -jnp.inf)
    # distance^2 = 2 - 2 sim for unit vectors
    best = jnp.argmax(sim, axis=1)
    s1 = jnp.max(sim, axis=1)
    sim_wo = sim.at[jnp.arange(sim.shape[0]), best].set(-jnp.inf)
    s2 = jnp.max(sim_wo, axis=1)
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s1, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s2, 1e-12))
    ok = d1 < ratio * d2
    ok = ok & jnp.isfinite(s1)
    if valid_a is not None:
        ok = ok & valid_a
    return best, ok
