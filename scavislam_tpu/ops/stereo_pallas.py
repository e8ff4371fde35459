"""Fused Pallas TPU kernel for block-matching stereo.

The XLA formulation (ops.stereo) materializes the (D, H, W) cost volume in
HBM several times over (raw costs, box-filtered costs, counts, shifted
right-view costs): ~250 MB of HBM traffic for a 512x384/64-disparity frame,
measured ~65 ms on a v5e chip. This kernel keeps EVERYTHING in VMEM:

- grid over row slabs (ROWS output rows per step);
- the two prefiltered images are DMA'd slab-wise from HBM with a
  (radius)-row halo;
- the full per-slab cost volume (D, ROWS, W) lives in a VMEM scratch
  (64 x 32 x 512 x 4B = 4 MB < 16 MB VMEM);
- horizontal/vertical box filtering is static shift-adds (pure VPU);
- argmin, uniqueness (min excluding +-1 neighbors), subpixel parabola, and
  the right-view winner map all happen in-register before ONE (H, W) write.

HBM traffic drops to 2 reads + 3 writes of (H, W) — ~3 MB.

Outputs: subpixel disparity (invalid = -1), the integer winner, and the
right-image winner map; the final left-right consistency comparison is a
cheap (H, W) take_along_axis done by the XLA wrapper.

Semantics match ops.stereo.block_matching_disparity (same prefilter, window,
uniqueness ratio, texture threshold) except border bookkeeping: windows
touching invalid columns are rejected via a large-constant cost rather than
an exact finite-sample count — both reject the same interior pixels.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1.0e9  # cost for invalid comparisons


def _shift_right(x, d, fill):
    """Shift columns right by static d (column j reads j-d), fill left."""
    if d == 0:
        return x
    return jnp.concatenate(
        [jnp.full((*x.shape[:-1], d), fill, x.dtype), x[..., :-d]], axis=-1
    )


def _shift_left(x, d, fill):
    if d == 0:
        return x
    return jnp.concatenate(
        [x[..., d:], jnp.full((*x.shape[:-1], d), fill, x.dtype)], axis=-1
    )


def _box_h(x, radius):
    """Horizontal box sum via static shifts (invalid -> BIG propagates)."""
    acc = x
    for r in range(1, radius + 1):
        acc = acc + _shift_right(x, r, BIG) + _shift_left(x, r, BIG)
    return acc


HALO = 8  # sublane-aligned halo (>= radius; DMA slices must be 8-row aligned)


def _bm_kernel(
    lf_hbm, rf_hbm, disp_ref, best_ref, bestr_ref,
    lf_s, rf_s, vol, sem,
    *, num_disp, radius, rows, width, height, uniq, tex_thr,
    batched=False,
):
    # batched mode: grid (B, h//rows) — one extra leading grid dimension
    # selects the stream; everything else is identical per slab. This is
    # how N streams' disparity runs as ONE parallel kernel launch instead
    # of a lax.map of sequential launches (the sequential form was B-linear
    # by construction: 0.6 -> 5.0 ms from B=1 to B=8, the 2nd-largest
    # stage of the batched frontend step — profile_multistream.py).
    if batched:
        b = pl.program_id(0)
        i = pl.program_id(1)
        lf_src = lf_hbm.at[b]
        rf_src = rf_hbm.at[b]
    else:
        i = pl.program_id(0)
        lf_src = lf_hbm
        rf_src = rf_hbm
    slab = rows + 2 * HALO

    # DMA the two image slabs (halo included; inputs pre-padded by HALO rows)
    cp1 = pltpu.make_async_copy(
        lf_src.at[pl.ds(i * rows, slab)], lf_s, sem.at[0]
    )
    cp2 = pltpu.make_async_copy(
        rf_src.at[pl.ds(i * rows, slab)], rf_s, sem.at[1]
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    lf = lf_s[:, :]
    rf = rf_s[:, :]
    base = HALO - radius  # local row offset of the first vertical-window row
    slab_rows = rows + 2 * HALO
    col = jax.lax.broadcasted_iota(jnp.int32, (slab_rows, width), 1)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)

    # ---- pass 1: fill the VMEM cost volume (box-filtered SAD per d).
    # fori_loop (NOT an unrolled python loop — 64 unrolled iterations keep
    # ~60 MB of temporaries live on the Mosaic stack and blow VMEM).
    # Vertical 11-tap box sum as a banded-0/1-matrix matmul: sublane-shifted
    # slices (`hsum[base+rr : ...]`) relayout the register file per tap on
    # TPU; the MXU absorbs the misalignment in ONE (rows, slab) @ (slab, W)
    # product. The band matrix is built from iotas (Pallas kernels cannot
    # capture host constants).
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, slab_rows), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, slab_rows), 1)
    Bband = ((ci >= HALO - radius + ri)
             & (ci <= HALO + radius + ri)).astype(jnp.float32)

    def box_h_roll(x):
        # horizontal box sum with pltpu.roll (lane rotates — the concat
        # formulation of _box_h relayouts the register file per shift)
        acc = x
        for r in range(1, radius + 1):
            acc = acc + jnp.where(col >= r, pltpu.roll(x, r, axis=1), BIG)
            acc = acc + jnp.where(col < width - r,
                                  pltpu.roll(x, width - r, axis=1), BIG)
        return acc

    # argmin is FOLDED into the fill pass (one loop instead of two), the
    # right image is rolled INCREMENTALLY (static roll-by-1 carried through
    # the loop), and the body is manually unrolled x4: the per-iteration
    # Mosaic loop overhead, not the vector work, dominates at 64 iterations.
    UNROLL = 4
    assert num_disp % UNROLL == 0

    def fill(k, carry):
        best, cmin, rfd = carry
        for j in range(UNROLL):
            d = k * UNROLL + j
            diff = jnp.where(col >= d, jnp.abs(lf - rfd), BIG)
            hsum = box_h_roll(diff)
            acc = jnp.dot(Bband, hsum, preferred_element_type=jnp.float32)
            vol[pl.ds(d, 1), :, :] = acc[None]
            take = acc < cmin
            best = jnp.where(take, d, best)
            cmin = jnp.where(take, acc, cmin)
            rfd = pltpu.roll(rfd, 1, axis=1)
        return (best, cmin, rfd)

    best, cmin, _ = jax.lax.fori_loop(
        0, num_disp // UNROLL, fill,
        (jnp.zeros((rows, width), jnp.int32),
         jnp.full((rows, width), BIG, jnp.float32),
         rf),
    )

    # ---- texture measure: box sum of |lf| (center rows only)
    tex = jnp.dot(Bband, _box_h(jnp.abs(lf), radius),
                  preferred_element_type=jnp.float32)
    full = float((2 * radius + 1) ** 2)

    # ---- runner-up (excluding +-1), subpixel neighbors, right-view winner
    def pass2(k, carry):
        c2, c_m, c_p, bestr, bestr_c = carry
        for j in range(UNROLL):
            d = k * UNROLL + j
            c = vol[pl.ds(d, 1), :, :][0]
            far = jnp.abs(best - d) > 1
            c2 = jnp.where(far & (c < c2), c, c2)
            c_m = jnp.where(best - 1 == d, c, c_m)
            c_p = jnp.where(best + 1 == d, c, c_p)
            # right-view winner: candidate for right pixel u-d is cost[d][u]
            cl = jnp.where(
                col_c < width - d, pltpu.roll(c, -d, axis=1), BIG
            )
            tr = cl < bestr_c
            bestr = jnp.where(tr, d, bestr)
            bestr_c = jnp.where(tr, cl, bestr_c)
        return (c2, c_m, c_p, bestr, bestr_c)

    c2, c_m, c_p, bestr, bestr_c = jax.lax.fori_loop(
        0, num_disp // UNROLL, pass2,
        (jnp.full((rows, width), BIG, jnp.float32),
         jnp.full((rows, width), BIG, jnp.float32),
         jnp.full((rows, width), BIG, jnp.float32),
         jnp.zeros((rows, width), jnp.int32),
         jnp.full((rows, width), BIG, jnp.float32)),
    )

    # ---- left-right consistency IN-KERNEL: we need bestr[u - best[u]],
    # a per-pixel variable shift. As an XLA take_along_axis in the wrapper
    # this was a 196k-element gather costing 2 ms/frame — 4x the rest of
    # the kernel. Here: 64 select iterations over an incrementally-rolled
    # bestr (static roll-by-1), pure VPU.
    def lrsel(k, carry):
        lr, br = carry
        for j in range(UNROLL):
            d = k * UNROLL + j
            lr = jnp.where(best == d, br, lr)
            br = pltpu.roll(br, 1, axis=1)
        return (lr, br)

    d_r_at, _ = jax.lax.fori_loop(
        0, num_disp // UNROLL, lrsel,
        (jnp.full((rows, width), -99, jnp.int32), bestr),
    )
    lr_ok = jnp.abs(best - d_r_at) <= 1

    bf = best.astype(jnp.float32)
    denom = c_m + c_p - 2.0 * cmin
    interior = (best > 0) & (best < num_disp - 1) & (c_m < BIG) & (c_p < BIG)
    delta = jnp.where(
        interior & (denom > 1e-9),
        0.5 * (c_m - c_p) / jnp.maximum(denom, 1e-9),
        0.0,
    )
    disp = bf + jnp.clip(delta, -0.5, 0.5)

    # border rows: the XLA twin rejects windows touching out-of-image pixels
    # (count >= full); the zero-padded halo here would otherwise score them
    # as plausible-and-valid, feeding garbage depths into the dense cloud
    # (measured: it flipped the keyframe policy on 192-row spin runs)
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0) + i * rows
    in_img = (grow >= radius) & (grow < height - radius)
    valid = (
        (cmin < 1e4)
        & (cmin * uniq <= c2)
        & (tex / full > tex_thr)
        & (best > 0)
        & in_img
        & lr_ok
    )
    if batched:
        disp_ref[0, :, :] = jnp.where(valid, disp, -1.0)
        best_ref[0, :, :] = best
        bestr_ref[0, :, :] = bestr
    else:
        disp_ref[:, :] = jnp.where(valid, disp, -1.0)
        best_ref[:, :] = best
        bestr_ref[:, :] = bestr


@partial(
    jax.jit,
    static_argnames=("num_disp", "radius", "rows", "uniqueness_ratio",
                     "texture_threshold", "interpret"),
)
def block_matching_disparity_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disp: int = 64,
    radius: int = 5,
    rows: int = 32,
    uniqueness_ratio: float = 1.10,
    texture_threshold: float = 0.01,
    interpret: bool = False,
):
    """Drop-in Pallas replacement for ops.stereo.block_matching_disparity
    (prefiltered SAD; see module docstring for the fusion strategy)."""
    from scavislam_tpu.ops.stereo import _sobel_x_prefilter

    h, w = left.shape
    assert h % rows == 0, "image height must be a multiple of the slab size"
    lf = _sobel_x_prefilter(left)
    rf = _sobel_x_prefilter(right)
    # pad by HALO rows top/bottom so every slab has an 8-aligned halo
    from scavislam_tpu.ops.stereo_pallas import HALO as _H
    lf_p = jnp.pad(lf, ((_H, _H), (0, 0)))
    rf_p = jnp.pad(rf, ((_H, _H), (0, 0)))

    grid = h // rows
    kernel = partial(
        _bm_kernel,
        num_disp=num_disp, radius=radius, rows=rows, width=w, height=h,
        uniq=uniqueness_ratio, tex_thr=texture_threshold,
    )
    disp, best, bestr = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * HALO, w), jnp.float32),
            pltpu.VMEM((rows + 2 * HALO, w), jnp.float32),
            pltpu.VMEM((num_disp, rows, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lf_p, rf_p)

    # left-right consistency is applied inside the kernel (no XLA gather)
    del best, bestr
    return disp


@partial(
    jax.jit,
    static_argnames=("num_disp", "radius", "rows", "uniqueness_ratio",
                     "texture_threshold", "interpret"),
)
def block_matching_disparity_pallas_batched(
    left: jnp.ndarray,  # (B, h, w)
    right: jnp.ndarray,
    num_disp: int = 64,
    radius: int = 5,
    rows: int = 32,
    uniqueness_ratio: float = 1.10,
    texture_threshold: float = 0.01,
    interpret: bool = False,
):
    """Batched twin of :func:`block_matching_disparity_pallas`: N streams'
    disparity as ONE kernel launch over a (B, h//rows) grid. A Pallas
    kernel cannot be vmapped and a `lax.map` of launches is sequential
    (B-linear); the extra grid dimension lets the TPU schedule all B x
    slabs as one parallel program. Bit-identical per stream to the
    single-image kernel (same body; the batch index only selects the DMA
    source and output block)."""
    from scavislam_tpu.ops.stereo import _sobel_x_prefilter

    B, h, w = left.shape
    assert h % rows == 0, "image height must be a multiple of the slab size"
    lf = jax.vmap(_sobel_x_prefilter)(left)
    rf = jax.vmap(_sobel_x_prefilter)(right)
    lf_p = jnp.pad(lf, ((0, 0), (HALO, HALO), (0, 0)))
    rf_p = jnp.pad(rf, ((0, 0), (HALO, HALO), (0, 0)))

    kernel = partial(
        _bm_kernel,
        num_disp=num_disp, radius=radius, rows=rows, width=w, height=h,
        uniq=uniqueness_ratio, tex_thr=texture_threshold, batched=True,
    )
    disp, best, bestr = pl.pallas_call(
        kernel,
        grid=(B, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, h, w), jnp.float32),
            jax.ShapeDtypeStruct((B, h, w), jnp.int32),
            jax.ShapeDtypeStruct((B, h, w), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * HALO, w), jnp.float32),
            pltpu.VMEM((rows + 2 * HALO, w), jnp.float32),
            pltpu.VMEM((num_disp, rows, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lf_p, rf_p)
    del best, bestr
    return disp
