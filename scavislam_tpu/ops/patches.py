"""Patch extraction, affine warping, and ZMSSD scoring (batched).

TPU-native replacement for the reference's GuidedMatcher patch machinery
(/root/reference/scavislam/matcher.cpp): 8x8 reference patches warped by a
local affine approximation (matcher.cpp:403-458 "warpAffinve"), scored against
candidate corners with zero-mean SSD (matcher.cpp:42-74, written there for
gcc auto-vectorization; here one batched einsum that lowers to the MXU).

All functions are shape-static and vmappable; invalid entries are masked, not
skipped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.ops.image import bilinear_sample

PATCH = 8  # patch side; reference uses halfpatch_size=4 (matcher.hpp)


def _patch_offsets(size: int = PATCH) -> np.ndarray:
    """(size*size, 2) offsets centered on the patch center (float)."""
    r = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    ou, ov = np.meshgrid(r, r)
    return np.stack([ou.reshape(-1), ov.reshape(-1)], axis=-1)


def extract_patches(img: jnp.ndarray, uv: jnp.ndarray, size: int = PATCH):
    """Sample axis-aligned patches at centers uv (N, 2).

    Returns (patches (N, size*size), valid (N,)) — valid iff every sample in
    the patch landed inside the image.
    """
    offs = jnp.asarray(_patch_offsets(size))  # (P, 2)
    coords = uv[:, None, :] + offs[None, :, :]  # (N, P, 2)
    vals, ok = bilinear_sample(img, coords)
    return vals, jnp.all(ok, axis=-1)


def extract_patches_warped(
    img: jnp.ndarray, uv: jnp.ndarray, A: jnp.ndarray, size: int = PATCH
):
    """Sample patches at uv with per-patch 2x2 affine warp A (N, 2, 2):
    sample at uv + A @ offset. Parity: matcher.cpp:403-458 (the reference
    warps the REFERENCE patch toward the current view; we do the same by
    passing the anchor image here with A = d(uv_anchor)/d(uv_cur))."""
    offs = jnp.asarray(_patch_offsets(size))  # (P, 2)
    w_offs = jnp.einsum("nij,pj->npi", A, offs)  # (N, P, 2)
    coords = uv[:, None, :] + w_offs
    vals, ok = bilinear_sample(img, coords)
    return vals, jnp.all(ok, axis=-1)


def zmssd(ref: jnp.ndarray, cands: jnp.ndarray):
    """Zero-mean SSD between each reference patch and its candidates.

    ref:   (N, P)    flattened reference patches
    cands: (N, M, P) flattened candidate patches
    returns (N, M) scores (lower is better).

    ZMSSD(a,b) = sum(((a - mean a) - (b - mean b))^2), expanded into
    norms + a cross term so the cross term is one batched matmul.
    """
    a = ref - jnp.mean(ref, axis=-1, keepdims=True)
    b = cands - jnp.mean(cands, axis=-1, keepdims=True)
    a2 = jnp.sum(a * a, axis=-1)  # (N,)
    b2 = jnp.sum(b * b, axis=-1)  # (N, M)
    ab = jnp.einsum("np,nmp->nm", a, b, preferred_element_type=jnp.float32)
    return a2[:, None] + b2 - 2.0 * ab


def patch_variance(p: jnp.ndarray):
    """Per-patch intensity variance — low-texture rejection
    (parity: matcher.cpp:384-386 rejects low-texture reference patches)."""
    m = jnp.mean(p, axis=-1, keepdims=True)
    return jnp.mean((p - m) ** 2, axis=-1)


def affine_from_geometry(
    focal_ref, focal_cur, R_cur_from_anchor: jnp.ndarray,
    xyz_anchor: jnp.ndarray, xyz_cur: jnp.ndarray
):
    """Local affine map A = d(uv_cur)/d(uv_anchor) (N, 2, 2) from the
    first-order expansion of (project o rigid o unproject-at-depth):

      A = Jproj(xyz_cur) @ R_ca @ [z_a/f_ref * e1, z_a/f_ref * e2]

    i.e. a fronto-parallel local patch assumption, matching the reference's
    finite-difference construction in matcher.cpp:403-458.
    """
    z_a = xyz_anchor[..., 2]
    z_c = xyz_cur[..., 2]
    x_c = xyz_cur[..., 0]
    y_c = xyz_cur[..., 1]
    zc2 = z_c * z_c
    zero = jnp.zeros_like(z_c)
    Jp = jnp.stack(
        [
            jnp.stack([focal_cur / z_c, zero, -focal_cur * x_c / zc2], axis=-1),
            jnp.stack([zero, focal_cur / z_c, -focal_cur * y_c / zc2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    # columns of d xyz_anchor / d uv_anchor
    scale = (z_a / focal_ref)[..., None]
    du = R_cur_from_anchor[..., :, 0] * scale  # (N, 3)
    dv = R_cur_from_anchor[..., :, 1] * scale
    cols = jnp.stack([du, dv], axis=-1)  # (N, 3, 2)
    return Jp @ cols  # (N, 2, 2)
