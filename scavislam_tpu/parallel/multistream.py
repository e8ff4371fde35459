"""Multi-stream SLAM over a device mesh: data-parallel streams + sharded BA.

The reference is a single-node, single-sequence pipeline (SURVEY.md §2: no
DP/TP/PP — 4 CPU threads). Scaling on TPU means: N independent camera streams
batched per chip (BASELINE.json config 5: 8 vmapped New College streams) and
sharded ACROSS chips over ICI with `jax.sharding` — there is no reference
semantics to preserve here, so the layout is chosen for the hardware:

- mesh axes ("dp", "sp"):
  * dp — streams (pure data parallel, zero cross-talk);
  * sp — the observation axis INSIDE each stream's bundle-adjustment
    reduction: each shard computes partial normal equations (J^T W J, J^T W r)
    over its observation slice and a `psum` over "sp" assembles the full 6x6
    system — the classic reduce-over-sequence-parallel pattern, riding ICI.

The per-stream step here is the motion-only tracking core (projection,
residuals, robust weights, normal equations, on-device solve, SE3 update) —
the numerically heavy inner loop of the frontend. vmapped over local streams,
shard_mapped over the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scavislam_tpu.core.lie import SE3, hat


def make_mesh(n_devices: int = None, dp: int = None):
    """Build a ("dp", "sp") mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        # prefer splitting streams; keep sp = 2 when possible
        dp = n if n % 2 else n // 2
        sp = 1 if n % 2 else 2
    else:
        sp = n // dp
    mesh_devs = np.array(devs).reshape(dp, sp)
    return Mesh(mesh_devs, ("dp", "sp"))


def _tracking_core(cam_params, R, t, xyz_w, obs_uvu, weights, valid, iters,
                   sp_axis="sp"):
    """GN/LM motion-only tracking with the obs axis SHARDED: the normal
    equations are psum-reduced over the `sp_axis` mesh axis each iteration
    (pass sp_axis=None for single-device / vmapped-only use)."""
    focal, ppx, ppy, baseline = cam_params

    def normal_eq(R, t):
        y = jnp.einsum("ij,nj->ni", R, xyz_w) + t
        z = jnp.where(jnp.abs(y[:, 2]) < 1e-6, 1e-6, y[:, 2])
        u = y[:, 0] / z * focal + ppx
        v = y[:, 1] / z * focal + ppy
        ur = (y[:, 0] - baseline) / z * focal + ppx
        pred = jnp.stack([u, v, ur], axis=-1)
        r = obs_uvu - pred
        mask = valid & (y[:, 2] > 0.1) & jnp.all(jnp.isfinite(r), axis=-1)
        r = jnp.where(mask[:, None], r, 0.0)
        s = jnp.sum(r * r, axis=-1)
        w = weights * mask / jnp.sqrt(1.0 + s)
        z2 = z * z
        zero = jnp.zeros_like(z)
        j0 = jnp.stack([focal / z, zero, -focal * y[:, 0] / z2], -1)
        j1 = jnp.stack([zero, focal / z, -focal * y[:, 1] / z2], -1)
        j2 = jnp.stack(
            [focal / z, zero, -focal * (y[:, 0] - baseline) / z2], -1)
        Jp = jnp.stack([j0, j1, j2], axis=-2)  # (N, 3, 3)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), (*z.shape, 3, 3))
        Jx = jnp.concatenate([eye, -hat(y)], axis=-1)
        J = Jp @ Jx  # (N, 3, 6)
        Jw = J * w[:, None, None]
        H_part = jnp.einsum("nij,nik->jk", Jw, J)
        b_part = jnp.einsum("nij,ni->j", Jw, r)
        chi_part = jnp.sum(w * s)
        if sp_axis is None:
            return H_part, b_part, chi_part
        # the ICI collective: assemble the full system across the shards
        H = jax.lax.psum(H_part, sp_axis)
        b = jax.lax.psum(b_part, sp_axis)
        chi = jax.lax.psum(chi_part, sp_axis)
        return H, b, chi

    def body(carry, _):
        R, t = carry
        H, b, chi = normal_eq(R, t)
        Hd = H + 1e-2 * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        x = jax.scipy.linalg.solve(Hd, b, assume_a="pos")
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        T = SE3.exp(x) @ SE3(R, t)
        return (T.R, T.t), chi

    (R, t), chis = jax.lax.scan(body, (R, t), None, length=iters)
    return R, t, chis[-1]


def build_multistream_step(mesh: Mesh, cam_params, iters: int = 5):
    """Return a jitted step over sharded stream batches.

    Inputs (global shapes):
      R (B, 3, 3), t (B, 3)           sharded ("dp", None, None)
      xyz_w (B, N, 3)                 sharded ("dp", "sp", None)
      obs_uvu (B, N, 3), weights/valid (B, N)  likewise.
    Returns updated (R, t) sharded over "dp" plus per-stream chi2.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def per_stream(R, t, xyz, obs, w, v):
        return _tracking_core(cam_params, R, t, xyz, obs, w, v, iters)

    def local_step(R, t, xyz, obs, w, v):
        # vmap over the local stream sub-batch; the "sp" axis stays inside
        # _tracking_core's psum.
        return jax.vmap(per_stream)(R, t, xyz, obs, w, v)

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("dp", None, None), P("dp", None),
            P("dp", "sp", None), P("dp", "sp", None),
            P("dp", "sp"), P("dp", "sp"),
        ),
        out_specs=(P("dp", None, None), P("dp", None), P("dp")),
    )
    return jax.jit(step)


def shard_stream_batch(mesh: Mesh, arrays_specs):
    """Device-put arrays with the given PartitionSpecs."""
    out = []
    for arr, spec in arrays_specs:
        out.append(jax.device_put(arr, NamedSharding(mesh, spec)))
    return out


def build_sharded_ba(mesh: Mesh, cam_params, iters: int = 2,
                     huber: float = 3.0, axis: str = "sp"):
    """Jitted DWO bundle-adjustment solve with the OBSERVATION axis sharded
    over the mesh's `axis`: each device scatter-adds the normal-equation
    contributions of its observation slice and one `psum` over ICI assembles
    the (P*6)^2 Schur system, which every shard then factorizes redundantly
    (replicated solve — the system is tiny next to the linearization work).

    Pose/point/edge tables are replicated; only obs_{pose,point,uvu,weight,
    valid} are sharded. Returns (R, t, psi, chi2_final), all replicated.

    This is the multi-chip scaling path for the backend: the reference has
    no analogue (single-node g2o, SURVEY.md §2) — the layout is chosen for
    the hardware, not translated.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from scavislam_tpu.models.ba_solver import BAProblem, solve_ba

    def local_solve(prob: BAProblem):
        R, t, psi, stats = solve_ba(
            cam_params, prob, iters=iters, huber=huber, sp_axis=axis
        )
        return R, t, psi, stats.chi2_final

    rep = P()
    obs_sharded = P(axis)
    in_spec = BAProblem(
        R=rep, t=rep, pose_valid=rep, pose_fixed=rep,
        psi=rep, anchor_slot=rep, point_valid=rep,
        obs_pose=obs_sharded, obs_point=obs_sharded,
        obs_uvu=P(axis, None), obs_weight=obs_sharded,
        obs_valid=obs_sharded,
        edge_i=rep, edge_j=rep, edge_R=rep, edge_t=rep,
        edge_info=rep, edge_valid=rep,
    )
    step = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(step)


def build_multistream_frontend(mesh, cam_params, cam_statics, levels=3,
                               num_disp=64, zmssd_thr=0.18,
                               max_reproj=2.0, dense_subs=None,
                               dense_sample="matmul"):
    """The FULL fused per-frame frontend step (preprocess -> stereo ->
    dense tracking -> corners -> guided matching -> motion BA -> policy
    stats -> next cloud state) vmapped over a stream batch, optionally
    shard_mapped over the mesh's "dp" axis (BASELINE config 5: N parallel
    New College streams per chip; across chips pure data parallelism over
    ICI).

    Host keyframe policy is per-stream host work and is NOT batched here —
    streams run visual odometry against their candidate tables, which is
    the steady-state shape of the per-frame device load.

    Stereo: a Pallas kernel cannot be VMAPPED, and the XLA twin under vmap
    materializes B full cost volumes ((H, W, D) f32 each — measured 8
    streams at 512x384xD64 dropping the batched step to 37 fps total). So
    on TPU the disparity runs as a `lax.map` over streams of the fused
    Pallas kernel (sequential kernel launches inside the ONE program,
    VMEM-resident cost volume each) and feeds the step's external-disparity
    path; on CPU (tests/dryrun, tiny shapes) the vmapped XLA twin is fine.

    Returns step(frames(B,2,H,W), clouds, intens, valids, Js, R(B,3,3),
    t(B,3), actkey(B,), poses, points, cand(B,C)) -> FrontendStepOut with a
    leading stream axis on every leaf.
    """
    from scavislam_tpu.models.frontend_step import (
        _USE_PALLAS_BM,
        DENSE_SUBS,
        frontend_step,
    )

    h_img = cam_statics[0][1]
    use_pallas = _USE_PALLAS_BM and h_img % 32 == 0
    subs = tuple(dense_subs) if dense_subs is not None else DENSE_SUBS

    def one(frames, clouds, intens, valids, Js, R, t, ak, poses, points,
            cand):
        return frontend_step(
            frames, clouds, intens, valids, Js, R, t, ak, poses, points,
            cand, cam_params, cam_statics, levels, num_disp, use_pallas,
            max_reproj, zmssd_thr, 1, dense_subs=subs,
            # batched streams default to the MXU bilinear sampler: scalar
            # gathers serialize across vmapped streams (B-linear dense
            # stage, profile_multistream.py), matmuls batch for free
            dense_sample=dense_sample,
        )

    def vstep(frames, clouds, intens, valids, Js, R, t, ak, poses, points,
              cand):
        if use_pallas:
            from scavislam_tpu.ops.stereo_pallas import (
                block_matching_disparity_pallas_batched,
            )

            frames_f = (frames.astype(jnp.float32) / 255.0
                        if frames.dtype == jnp.uint8 else frames)
            # one (B, h//rows)-grid kernel launch — the previous lax.map of
            # per-stream launches was sequential, i.e. B-linear (0.6 -> 5.0
            # ms at B=8, profile_multistream.py)
            disp = block_matching_disparity_pallas_batched(
                frames_f[:, 0], frames_f[:, 1], num_disp=num_disp, radius=5)
            frames_f = jnp.concatenate([frames_f, disp[:, None]], axis=1)
            return jax.vmap(one)(frames_f, clouds, intens, valids, Js, R,
                                 t, ak, poses, points, cand)
        return jax.vmap(one)(frames, clouds, intens, valids, Js, R, t, ak,
                             poses, points, cand)
    if mesh is None:
        return jax.jit(vstep)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    step = shard_map(
        vstep, mesh=mesh,
        in_specs=P("dp"),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(step)


def build_multistream_mono(mesh, cam_params, cam_statics, levels=3,
                           zmssd_thr=0.18):
    """The fused per-frame MONOCULAR step (models.mono_step) vmapped over a
    stream batch and shard_mapped over the mesh's "dp" axis — the mono
    analogue of build_multistream_frontend. Each stream carries its own
    pose/point/Lambda tables (leading batch axis on every leaf); there is
    no stereo stage, so no Pallas special-casing is needed.

    Returns step(imgs(B,H,W), R(B,3,3), t(B,3), ak(B,), poses, points,
    Lam(B,P,3,3), cand(B,C), conv_thr(B,), prior_w(B,)) -> MonoStepOut with
    a leading stream axis on every leaf."""
    from scavislam_tpu.models.mono_step import mono_step

    def one(img, R, t, ak, poses, points, Lam, cand, conv, pw):
        return mono_step(
            img, R, t, ak, poses, points, Lam, cand, conv, pw,
            cam_params, cam_statics, levels, 2.0, zmssd_thr,
        )

    def vstep(imgs, R, t, ak, poses, points, Lam, cand, conv, pw):
        return jax.vmap(one)(imgs, R, t, ak, poses, points, Lam, cand,
                             conv, pw)

    if mesh is None:
        return jax.jit(vstep)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    step = shard_map(
        vstep, mesh=mesh,
        in_specs=P("dp"),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(step)
