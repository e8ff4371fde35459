"""Belief-propagation stereo: hierarchical min-sum BP and a constant-space
(top-K candidate) variant.

TPU-native re-design of the reference's two remaining runtime-selectable
disparity methods (/root/reference/scavislam/stereo_frontend.cpp:581-614):
method 3 = cv::gpu::StereoBeliefPropagation(ndisp) and method 4 =
cv::gpu::StereoConstantSpaceBP(ndisp, iters, levels, nr_plane). The CUDA
implementations sweep checkerboard message kernels; here each BP iteration is
a synchronous (Jacobi) full-grid update built from shifts + elementwise mins
— pure VPU work with no gathers — and the truncated-linear message
minimization uses the Felzenszwalb–Huttenlocher distance transform (one
forward + one backward cumulative-min pass over the disparity axis) instead
of the naive O(D^2) min, so one message update is O(D) shifted mins.

The hierarchy follows cv::gpu: the (D, H, W) data-cost volume is sum-pooled
2x2 per level, messages run `iters` rounds at each level coarse->fine and are
nearest-upsampled between levels.

Constant-space variant: the coarsest level runs full-D BP, then each finer
level keeps only the K = nr_plane best disparity candidates per pixel
(selected from the coarser belief), recomputes data costs at those candidates
only (one flat gather), and passes messages over candidate sets with a
(K x K) truncated-linear coupling — memory is O(K H W) instead of O(D H W),
the defining property of CSBP (Yang et al., CVPR 2010).

Parameters follow the OpenCV defaults the reference relies on
(StereoBeliefPropagation: max_data_term 10, data_weight 0.07, max_disc_term
1.7, disc_single_jump 1, on 0..255 intensities; iters 5, levels 5). Images
arrive as f32 0..1 and are scaled by 255 so those constants keep their
meaning. Output matches the pipeline's disparity contract: float32 (H, W),
invalid pixels <= 0 (BP is dense, so only the d==0 plane is "invalid").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift2d(x, dy, dx):
    """Shift the last two axes by (dy, dx), zero-filling exposed borders."""
    if dy:
        x = jnp.roll(x, dy, axis=-2)
        if dy > 0:
            x = x.at[..., :dy, :].set(0.0)
        else:
            x = x.at[..., dy:, :].set(0.0)
    if dx:
        x = jnp.roll(x, dx, axis=-1)
        if dx > 0:
            x = x.at[..., :, :dx].set(0.0)
        else:
            x = x.at[..., :, dx:].set(0.0)
    return x


def _data_cost_volume(left, right, num_disp, max_data_term, data_weight):
    """(D, H, W) truncated-linear data cost on 0..255 intensities; columns
    with no counterpart (u < d) replicate the edge pixel (cv pads the same
    way rather than invalidating — BP must stay finite everywhere)."""
    w = left.shape[-1]
    uu = jnp.arange(w)[None, :]
    dd = jnp.arange(num_disp)[:, None]
    src = jnp.clip(uu - dd, 0, w - 1)  # (D, W), edge-clamped
    shifted = jnp.moveaxis(right[:, src], 1, 0)  # (D, H, W)
    diff = jnp.abs(left[None] - shifted) * 255.0
    return data_weight * jnp.minimum(diff, max_data_term)


def _sum_pool2(x):
    """Sum-pool the last two axes by 2 (odd sizes keep the trailing row/col
    as its own pool — cv's hierarchical cost build does the same clamp)."""
    h, w = x.shape[-2], x.shape[-1]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)])
    return (x[..., 0::2, 0::2] + x[..., 0::2, 1::2]
            + x[..., 1::2, 0::2] + x[..., 1::2, 1::2])


def _dt_truncated_linear(h, jump, max_disc):
    """min_d' (h[d'] + min(jump*|d-d'|, max_disc)) along axis 0, in O(D):
    forward/backward cumulative mins handle the linear term, a global
    min + max_disc handles the truncation. Messages are re-normalized to
    min 0 (min-sum messages drift without it)."""
    D = h.shape[0]
    m = h
    # forward: m[d] = min(m[d], m[d-1] + jump)
    rows = [m[0]]
    for d in range(1, D):
        rows.append(jnp.minimum(m[d], rows[-1] + jump))
    # backward: m[d] = min(m[d], m[d+1] + jump)
    out = [None] * D
    out[D - 1] = rows[D - 1]
    for d in range(D - 2, -1, -1):
        out[d] = jnp.minimum(rows[d], out[d + 1] + jump)
    m = jnp.stack(out)
    cap = jnp.min(h, axis=0, keepdims=True) + max_disc
    m = jnp.minimum(m, cap)
    return m - jnp.min(m, axis=0, keepdims=True)


# message layout: msg[k] = message INTO each pixel from its neighbor in
# direction k; directions index (dy, dx) of where the SENDER sits.
_DIRS = ((-1, 0), (1, 0), (0, -1), (0, 1))  # up, down, left, right


def _bp_iterate(data, msgs, iters, jump, max_disc):
    """Synchronous min-sum BP rounds on one level. data (D,H,W),
    msgs (4,D,H,W)."""

    def one_round(msgs, _):
        new = []
        for k, (dy, dx) in enumerate(_DIRS):
            # the sender's belief excluding what WE sent it: sender sits at
            # (y+dy, x+dx)... messages are stored at the receiver, so the
            # sender's incoming messages live shifted by (dy, dx). The
            # message it received from us is the opposite direction k^1
            # for vertical pairs / (k-2)^1+2 for horizontal — with this
            # direction table, opposite(k) = k ^ 1.
            h = data
            for j in range(4):
                if j == (k ^ 1):
                    continue
                h = h + msgs[j]
            h = _shift2d(h, dy, dx)  # pull the sender's h to the receiver
            m = _dt_truncated_linear(h, jump, max_disc)
            # pixels whose sender falls outside the image get no message
            if dy == -1:
                m = m.at[:, :1, :].set(0.0)
            elif dy == 1:
                m = m.at[:, -1:, :].set(0.0)
            elif dx == -1:
                m = m.at[:, :, :1].set(0.0)
            else:
                m = m.at[:, :, -1:].set(0.0)
            new.append(m)
        return jnp.stack(new), None

    msgs, _ = jax.lax.scan(one_round, msgs, None, length=iters)
    return msgs


def _upsample2(x, h, w):
    """Nearest-neighbor 2x upsample of the last two axes, cropped to (h, w)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)
    return x[..., :h, :w]


def _subpixel(belief, best, num_disp):
    c0 = jnp.take_along_axis(belief, best[None], axis=0)[0]
    bm = jnp.clip(best - 1, 0, num_disp - 1)
    bp = jnp.clip(best + 1, 0, num_disp - 1)
    c_m = jnp.take_along_axis(belief, bm[None], axis=0)[0]
    c_p = jnp.take_along_axis(belief, bp[None], axis=0)[0]
    denom = c_m + c_p - 2.0 * c0
    interior = (best > 0) & (best < num_disp - 1)
    delta = jnp.where(interior & (denom > 1e-9),
                      0.5 * (c_m - c_p) / jnp.maximum(denom, 1e-9), 0.0)
    return best.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)


@partial(jax.jit, static_argnames=("num_disp", "iters", "levels",
                                   "subpixel"))
def belief_propagation_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disp: int = 64,
    iters: int = 5,
    levels: int = 5,
    max_data_term: float = 10.0,
    data_weight: float = 0.07,
    max_disc_term: float = 1.7,
    disc_single_jump: float = 1.0,
    subpixel: bool = True,
):
    """Hierarchical loopy-BP disparity (reference stereo_method == 3).
    Returns float32 (H, W); dense (only d == 0 reads as invalid
    downstream)."""
    h, w = left.shape
    data0 = _data_cost_volume(left, right, num_disp, max_data_term,
                              data_weight)
    pyramid = [data0]
    for _ in range(1, levels):
        if min(pyramid[-1].shape[-2:]) < 2:
            break
        pyramid.append(_sum_pool2(pyramid[-1]))

    msgs = jnp.zeros((4,) + pyramid[-1].shape, jnp.float32)
    for lvl in range(len(pyramid) - 1, -1, -1):
        data = pyramid[lvl]
        msgs = _bp_iterate(data, msgs, iters, disc_single_jump,
                           max_disc_term)
        if lvl > 0:
            th, tw = pyramid[lvl - 1].shape[-2:]
            msgs = _upsample2(msgs, th, tw)

    belief = data0 + msgs.sum(axis=0)
    best = jnp.argmin(belief, axis=0)
    if subpixel:
        return _subpixel(belief, best, num_disp)
    return best.astype(jnp.float32)


# ---------------------------------------------------------------------- #
# constant-space variant
# ---------------------------------------------------------------------- #


def _candidate_data_cost(left, right, cand):
    """Data cost at per-pixel integer candidate disparities cand (K, H, W):
    one flat gather per tap (flat jnp.take is the fastest TPU gather form)."""
    h, w = left.shape
    uu = jnp.arange(w)[None, None, :]
    vv = jnp.arange(h)[None, :, None]
    src_u = jnp.clip(uu - cand, 0, w - 1)  # (K, H, W)
    flat = jnp.take(right.reshape(-1), (vv * w + src_u).reshape(-1))
    return jnp.abs(left[None] - flat.reshape(cand.shape)) * 255.0


def _csbp_iterate(data, cand, msgs, iters, jump, max_disc, data_weight,
                  max_data_term):
    """Min-sum BP over per-pixel candidate sets. data/cand (K,H,W),
    msgs (4,K,H,W). The coupling between a pixel's K candidates and its
    neighbor's K candidates is the explicit (K,K) truncated-linear table —
    K is small (nr_plane), so this stays elementwise VPU work."""
    dcost = data_weight * jnp.minimum(data, max_data_term)
    cf = cand.astype(jnp.float32)

    def one_round(msgs, _):
        new = []
        for k, (dy, dx) in enumerate(_DIRS):
            h = dcost
            for j in range(4):
                if j == (k ^ 1):
                    continue
                h = h + msgs[j]
            h_n = _shift2d(h, dy, dx)  # sender's h, (K, H, W)
            cand_n = _shift2d(cf, dy, dx)  # sender's candidates
            # pairwise truncated-linear coupling: (K_recv, K_send, H, W)
            pen = jnp.minimum(jump * jnp.abs(cf[:, None] - cand_n[None]),
                              max_disc)
            m = jnp.min(h_n[None] + pen, axis=1)
            m = m - jnp.min(m, axis=0, keepdims=True)
            if dy == -1:
                m = m.at[:, :1, :].set(0.0)
            elif dy == 1:
                m = m.at[:, -1:, :].set(0.0)
            elif dx == -1:
                m = m.at[:, :, :1].set(0.0)
            else:
                m = m.at[:, :, -1:].set(0.0)
            new.append(m)
        return jnp.stack(new), None

    msgs, _ = jax.lax.scan(one_round, msgs, None, length=iters)
    return msgs, dcost


@partial(jax.jit, static_argnames=("num_disp", "iters", "levels",
                                   "nr_plane"))
def constant_space_bp_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disp: int = 64,
    iters: int = 4,
    levels: int = 4,
    nr_plane: int = 4,
    max_data_term: float = 30.0,
    data_weight: float = 1.0,
    max_disc_term: float = 40.0,
    disc_single_jump: float = 4.0,
):
    """Constant-space BP disparity (reference stereo_method == 4,
    ui.stereo_iters/stereo_levels/stereo_nr_plane,
    stereo_frontend.cpp:595-614). Full-D BP runs only at the coarsest
    level; finer levels keep nr_plane candidates per pixel."""
    K = max(2, nr_plane)
    h, w = left.shape
    # image pyramids for per-level candidate data costs (mean-pooled)
    lp, rp = [left], [right]
    for _ in range(1, levels):
        if min(lp[-1].shape) < 2:
            break
        lp.append(_sum_pool2(lp[-1]) * 0.25)
        rp.append(_sum_pool2(rp[-1]) * 0.25)
    n_lvl = len(lp)

    # coarsest level: full-D hierarchical-free BP
    scale = 1 << (n_lvl - 1)
    d_coarse = max(2, num_disp // scale)
    data_c = _data_cost_volume(lp[-1], rp[-1], d_coarse, max_data_term,
                               data_weight)
    msgs = jnp.zeros((4,) + data_c.shape, jnp.float32)
    msgs = _bp_iterate(data_c, msgs, iters, disc_single_jump, max_disc_term)
    belief = data_c + msgs.sum(axis=0)

    # seed candidates from the coarsest belief: K best disparities/pixel
    _, cand = jax.lax.top_k(-jnp.moveaxis(belief, 0, -1), K)  # (h,w,K)
    cand = jnp.moveaxis(cand, -1, 0)  # (K, h, w)
    kmsgs = jnp.zeros((4,) + cand.shape, jnp.float32)

    for lvl in range(n_lvl - 2, -1, -1):
        th, tw = lp[lvl].shape
        # each parent candidate d expands to children {2d, 2d+1} at the
        # finer level (pure doubling would lock the output to multiples of
        # 2^(levels-1)); the K best by belief survive
        cand2 = jnp.concatenate(
            [_upsample2(cand, th, tw) * 2,
             _upsample2(cand, th, tw) * 2 + 1], axis=0)  # (2K, th, tw)
        kmsgs2 = jnp.concatenate(
            [_upsample2(kmsgs, th, tw)] * 2, axis=1)  # (4, 2K, th, tw)
        data2 = _candidate_data_cost(lp[lvl], rp[lvl], cand2)
        score = (data_weight * jnp.minimum(data2, max_data_term)
                 + kmsgs2.sum(axis=0))
        order = jnp.argsort(score, axis=0)[:K]  # (K, th, tw)
        cand = jnp.take_along_axis(cand2, order, axis=0)
        kmsgs = jnp.take_along_axis(
            kmsgs2, jnp.broadcast_to(order[None], (4,) + order.shape), axis=1
        )
        data = jnp.take_along_axis(data2, order, axis=0)
        kmsgs, dcost = _csbp_iterate(
            data, cand, kmsgs, iters, disc_single_jump, max_disc_term,
            data_weight, max_data_term,
        )
        kbelief = dcost + kmsgs.sum(axis=0)
        # put the winner in slot 0 for the next expansion / the output
        order = jnp.argsort(kbelief, axis=0)
        cand = jnp.take_along_axis(cand, order, axis=0)
        kmsgs = jnp.take_along_axis(
            kmsgs, jnp.broadcast_to(order[None], kmsgs.shape), axis=1
        )

    best = cand[0]
    return jnp.clip(best, 0, num_disp - 1).astype(jnp.float32)
