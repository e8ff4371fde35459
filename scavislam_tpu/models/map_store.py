"""Device-resident SLAM map tables: keyframe poses + anchored points.

The reference scatters map state across heap-allocated C++ objects
(SlamGraph::vertex_table/point_table, slam_graph.hpp:65-137) and pays pointer
chasing on every access. The TPU-native layout is two fixed-capacity
structure-of-arrays tables resident in HBM:

- pose table: (K, 3, 3) rotations + (K, 3) translations + valid mask
  (T_kw = world->keyframe), K = MAX_KEYFRAMES;
- point table: (P, 3) inverse-depth psi in the ANCHOR frame
  (psi = (x/z, y/z, 1/z), the reference's ψ parametrization,
  maths_utils.h:66-69), (P,) anchor keyframe index, (P,) pyramid level,
  (P, 16, 16) source patches for matching, valid mask.

Host code owns id allocation and covisibility bookkeeping (cheap scalar
work); all bulk math (world-point materialization, candidate gathers) happens
on device. Updates are functional (`.at[].set`) and jit-compatible; the
frontend/backend thread the tables through their jitted steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scavislam_tpu.core.lie import SE3

MAX_KEYFRAMES = 512
MAX_POINTS = 16384


class PoseTable(NamedTuple):
    R: jnp.ndarray  # (K, 3, 3)
    t: jnp.ndarray  # (K, 3)
    valid: jnp.ndarray  # (K,)

    @staticmethod
    def empty(cap: int = MAX_KEYFRAMES) -> "PoseTable":
        return PoseTable(
            jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (cap, 3, 3)),
            jnp.zeros((cap, 3), jnp.float32),
            jnp.zeros((cap,), bool),
        )

    def set(self, idx, T_kw: SE3) -> "PoseTable":
        return PoseTable(
            self.R.at[idx].set(T_kw.R),
            self.t.at[idx].set(T_kw.t),
            self.valid.at[idx].set(True),
        )

    def set_many(self, idx, Rs, ts) -> "PoseTable":
        """Batched pose writeback; out-of-bounds ids (padding) are dropped.
        One fixed-shape scatter instead of one program per keyframe."""
        return _pose_scatter(self, idx, Rs, ts)

    def get(self, idx) -> SE3:
        return SE3(self.R[idx], self.t[idx])


class PointTable(NamedTuple):
    psi: jnp.ndarray  # (P, 3) inverse-depth in anchor frame
    anchor: jnp.ndarray  # (P,) int32 keyframe index
    level: jnp.ndarray  # (P,) int32 pyramid level
    patch: jnp.ndarray  # (P, 16, 16) source patch (anchor level-l image)
    uv0: jnp.ndarray  # (P, 2) creation pixel position, level-0 coords
    valid: jnp.ndarray  # (P,)

    @staticmethod
    def empty(cap: int = MAX_POINTS) -> "PointTable":
        return PointTable(
            jnp.zeros((cap, 3), jnp.float32),
            jnp.zeros((cap,), jnp.int32),
            jnp.zeros((cap,), jnp.int32),
            jnp.zeros((cap, 16, 16), jnp.float32),
            jnp.zeros((cap, 2), jnp.float32),
            jnp.zeros((cap,), bool),
        )

    def insert_block(self, start, psi, anchor_id, level, patches, uv0, ok):
        """Write a contiguous block of new points starting at `start`
        (dynamic start, static block size — jit-friendly)."""
        n = psi.shape[0]
        return PointTable(
            jax.lax.dynamic_update_slice(self.psi, psi, (start, 0)),
            jax.lax.dynamic_update_slice(
                self.anchor, jnp.full((n,), anchor_id, jnp.int32), (start,)
            ),
            jax.lax.dynamic_update_slice(
                self.level, level.astype(jnp.int32), (start,)
            ),
            jax.lax.dynamic_update_slice(self.patch, patches, (start, 0, 0)),
            jax.lax.dynamic_update_slice(self.uv0, uv0, (start, 0)),
            jax.lax.dynamic_update_slice(self.valid, ok, (start,)),
        )


@jax.jit
def materialize_points(poses: PoseTable, points: PointTable, ids: jnp.ndarray):
    """Gather world positions + anchor poses for point ids (N,).

    xyz_w = A_aw^-1 * invert_depth(psi). Returns
    (xyz_w (N,3), R_aw (N,3,3), t_aw (N,3), patches (N,16,16), ok (N,)).
    Invalid ids (< 0) yield ok=False.
    """
    safe = jnp.clip(ids, 0, points.psi.shape[0] - 1)
    psi = points.psi[safe]
    q = psi[:, 2:3]
    q_safe = jnp.where(jnp.abs(q) < 1e-9, 1e-9, q)
    xyz_a = jnp.concatenate([psi[:, :2], jnp.ones_like(q)], axis=-1) / q_safe
    a_idx = points.anchor[safe]
    R_aw = poses.R[a_idx]
    t_aw = poses.t[a_idx]
    # T_wa = T_aw^-1 : x_w = R_aw^T (x_a - t_aw)
    xyz_w = jnp.einsum("nji,nj->ni", R_aw, xyz_a - t_aw)
    ok = (ids >= 0) & points.valid[safe] & poses.valid[a_idx] & (q[:, 0] > 1e-9)
    return xyz_w, R_aw, t_aw, points.patch[safe], ok


@jax.jit
def _pose_scatter(poses: PoseTable, idx, Rs, ts) -> PoseTable:
    return PoseTable(
        poses.R.at[idx].set(Rs, mode="drop"),
        poses.t.at[idx].set(ts, mode="drop"),
        poses.valid.at[idx].set(True, mode="drop"),
    )


@jax.jit
def scatter_psi(psi_table, pids, vals):
    """Masked psi writeback: `pids` padded with out-of-bounds ids (dropped).

    The backend returns a DIFFERENT number of optimized points per
    neighborhood; an unpadded eager `.at[pids].set` recompiled its scatter
    every keyframe (~3.5 s each, measured — it dominated end-to-end fps).
    Callers pad to a small set of bucket sizes instead.
    """
    return psi_table.at[pids].set(vals, mode="drop")
