"""StreamPool: N live SLAM streams batched through ONE fused device program.

The product surface for multi-stream operation (BASELINE.json config 5 made
end-to-end): N independent camera streams — each with its own keyframe map,
covisibility graph, candidate set, and trajectory — share a single batched
per-frame device program (parallel.multistream.build_multistream_frontend)
and a single packed fetch per tick. The reference has no analogue (it is a
single-sequence pipeline, SURVEY.md §2 parallelism row 6); the layout is
chosen for the TPU: the fused step vmapped over a leading stream axis, the
host policy looping over packed rows.

Division of labor per tick (B streams, one frame each):
  host:   per-stream candidate assembly (numpy)     -> ONE (B, C) upload
  device: ONE batched fused step (all B streams)    -> chained pose state
  host:   ONE (B, K) packed fetch (pipelined, depth ticks later)
          per-stream keyframe policy on each row; a stream that decides a
          keyframe dispatches its own single-stream spawn program (same
          compiled program as single-stream mode) against its OWN device
          tables; the batched tables are re-stacked lazily next tick.

Each stream's host state is a full StereoFrontend — policy, spawn, epoch
guard, covisibility, and id bookkeeping are the SAME code as single-stream
mode; only the device step and the packed fetch are batched here. Streams
fail independently: a tracking loss marks the stream dead, the batch keeps
running (its row computes garbage that nobody consumes).
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.models.frontend import CAND_CAP, StereoFrontend, _to_u8
from scavislam_tpu.parallel.multistream import build_multistream_frontend
from scavislam_tpu.utils.config import Config


class _Row:
    """A resolved packed row masquerading as a future (StereoFrontend._consume
    takes `fut.result()`); the batched (B, K) fetch already landed."""

    def __init__(self, row):
        self._row = row

    def result(self):
        return self._row


class _StreamView:
    """Lazy single-stream view of a batched FrontendStepOut: only the leaves
    the per-stream policy actually touches (pyr/disp for keyframe spawns) are
    sliced, and only when accessed — eager `x[s]` on every leaf would compile
    a dynamic-slice program per leaf shape."""

    def __init__(self, out, s: int):
        self._out = out
        self._s = s
        self._cache = {}

    @property
    def pyr(self):
        if "pyr" not in self._cache:
            self._cache["pyr"] = tuple(p[self._s] for p in self._out.pyr)
        return self._cache["pyr"]

    @property
    def disp(self):
        if "disp" not in self._cache:
            self._cache["disp"] = self._out.disp[self._s]
        return self._cache["disp"]

    def __getattr__(self, name):
        leaf = getattr(self._out, name)
        if isinstance(leaf, tuple):
            return tuple(x[self._s] for x in leaf)
        return leaf[self._s]


class StreamPool:
    """N concurrent visual-odometry streams over one batched device step.

    Keyframe spawning, candidate matching, switch policy, and the epoch guard
    run per stream (each stream owns a StereoFrontend); the per-frame compute
    and the host<->device traffic are batched: one frame upload, one step,
    one packed fetch per tick for ALL streams.
    """

    def __init__(self, cam: StereoCamera, cfg: Config = None,
                 n_streams: int = 8, mesh=None, pipeline_depth: int = 2):
        self.cfg = cfg or Config()
        self.B = int(n_streams)
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["dp"]
            if self.B % dp:
                raise ValueError(
                    f"n_streams={n_streams} not divisible by mesh dp={dp}")
        self.fes = [StereoFrontend(cam, self.cfg) for _ in range(self.B)]
        # batched density: the dense LM's bilinear gathers are the dominant,
        # B-linear cost of the batched step (31.9 of 54.5 ms at B=8,
        # benchmarks/profile_multistream.py). Pool streams track at the
        # reference's own CPU density (every 4th pixel, dense_tracking.h:82)
        # — 73k -> 27.6k cloud points at 512x384 (frontend_step.py:
        # DENSE_SUBS_BATCHED) — which is what the per-stream rolled
        # state and spawn programs must match.
        from scavislam_tpu.models.frontend_step import DENSE_SUBS_BATCHED

        for fe in self.fes:
            fe.dense_subs = DENSE_SUBS_BATCHED
        fe0 = self.fes[0]
        self.step = build_multistream_frontend(
            mesh, fe0._cam_params, fe0._cam_statics, levels=fe0.levels,
            num_disp=fe0._num_disp,
            max_reproj=float(self.cfg.ui.max_reproj_error),
            dense_subs=DENSE_SUBS_BATCHED,
        )
        self.trajectories = [[] for _ in range(self.B)]
        self.alive = [True] * self.B
        self.pipeline_depth = int(pipeline_depth)
        self._pending = deque()
        self._fetch_pool = fe0._fetch_pool
        # batched device state
        self._prev = None  # (clouds, intens, valids, Js), leading B axis
        self._chain = None  # (R_cw (B,3,3), t_cw (B,3)) device pose chain
        self._tables_key = None
        self._poses_b = None
        self._points_b = None
        self._cand_np = None
        self._cand_dev = None
        self._ak_np = None
        self._ak_dev = None

    # ------------------------------------------------------------------ #
    def _restack_tables(self):
        """Re-stack the per-stream device tables into the batched tables —
        only when some stream's table object changed (keyframe spawn /
        external write-back); most ticks this is a cache hit."""
        # keyed on each frontend's monotonically-bumped write counter, not
        # id() of the table objects (ids are recycled after GC: a finalize +
        # spawn between dispatches could alias and silently serve stale
        # batched tables)
        key = tuple(fe.tables_version for fe in self.fes)
        if key != self._tables_key:
            self._poses_b = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[fe.poses for fe in self.fes])
            self._points_b = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[fe.points for fe in self.fes])
            self._tables_key = key
        return self._poses_b, self._points_b

    def _cand_device(self, cand_rows: np.ndarray):
        if self._cand_np is None or not np.array_equal(
                self._cand_np, cand_rows):
            self._cand_np = cand_rows.copy()
            self._cand_dev = jnp.asarray(cand_rows, jnp.int32)
        return self._cand_dev

    def _ak_device(self):
        ak = np.asarray(
            [max(fe.actkey_id, 0) for fe in self.fes], np.int32)
        if self._ak_np is None or not np.array_equal(self._ak_np, ak):
            self._ak_np = ak
            self._ak_dev = jnp.asarray(ak)
        return self._ak_dev

    def _dispatch(self, frames, cand_rows):
        stacked = np.stack([
            np.stack([_to_u8(np.asarray(f["left"])),
                      _to_u8(np.asarray(f["right"]))])
            for f in frames
        ])
        frames_dev = jnp.asarray(stacked)
        poses_b, points_b = self._restack_tables()
        out = self.step(
            frames_dev, *self._prev, self._chain[0], self._chain[1],
            self._ak_device(), poses_b, points_b,
            self._cand_device(cand_rows),
        )
        self._chain = (out.R_cw, out.t_cw)
        self._prev = (out.clouds, out.intens, out.cloud_valids, out.cloud_J)
        return out

    # ------------------------------------------------------------------ #
    def process_first_frames(self, frames: list):
        """Frame 0 of every stream: each becomes its stream's first keyframe
        at the origin (parity per stream: processFirstFrame,
        stereo_frontend.cpp:91-181)."""
        assert len(frames) == self.B
        h, w = np.asarray(frames[0]["left"]).shape
        empty = self.fes[0]._empty_prev_state((h, w))
        batch = lambda x: jnp.broadcast_to(x, (self.B,) + x.shape)  # noqa: E731
        self._prev = tuple(jax.tree.map(batch, e) for e in empty)
        self._chain = (
            jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (self.B, 3, 3)),
            jnp.zeros((self.B, 3), jnp.float32),
        )
        cand_rows = np.full((self.B, CAND_CAP), -1, np.int64)
        out = self._dispatch(frames, cand_rows)
        pkts = []
        for s, fe in enumerate(self.fes):
            pkts.append(fe.bootstrap_first(_StreamView(out, s), frames[s]))
            self.trajectories[s].append(
                (frames[s].get("frame_id", 0), fe._world_pose()))
        return pkts

    def process_frames(self, frames: list):
        """One pool tick: dispatch this batch of frames (one per stream),
        then consume the batch dispatched `pipeline_depth` ticks ago.
        Returns None while the pipeline fills, else the consumed tick's
        per-stream (success, dropped, frame_id) list."""
        assert len(frames) == self.B
        cand_rows = np.stack(
            [fe._collect_candidates() for fe in self.fes])
        out = self._dispatch(frames, cand_rows)
        fut = self._fetch_pool.submit(np.asarray, out.packed)
        self._pending.append((
            [f.get("frame_id") for f in frames], cand_rows, out, fut,
            [fe._kf_epoch for fe in self.fes],
        ))
        if len(self._pending) <= max(1, self.pipeline_depth):
            return None
        return self._consume_oldest()

    def _consume_oldest(self):
        fids, cand_rows, out, fut, epochs = self._pending.popleft()
        pk = fut.result()  # (B, K) — the ONE packed fetch for all streams
        results = []
        for s, fe in enumerate(self.fes):
            if not self.alive[s]:
                results.append((False, False, fids[s]))
                continue
            ok, dropped = fe._consume(
                cand_rows[s], _StreamView(out, s), fut=_Row(pk[s]),
                epoch=epochs[s],
            )
            if ok:
                self.trajectories[s].append((fids[s], fe._world_pose()))
            else:
                self.alive[s] = False
            results.append((ok, dropped, fids[s]))
        return results

    def finish(self):
        """Drain the pipeline and finalize any pending keyframe spawns."""
        results = []
        while self._pending:
            results.append(self._consume_oldest())
        for fe in self.fes:
            if fe._pending_spawn is not None:
                rec, pkt_args = fe._pending_spawn
                fe._pending_spawn = None
                fe._finalize_keyframe(rec, pkt_args)
        return results

    def take_ready_packets(self):
        """Per-stream finalized AddToOptimizer packets since the last call:
        list of (stream_idx, packet)."""
        out = []
        for s, fe in enumerate(self.fes):
            for pkt in fe.take_ready_packets():
                out.append((s, pkt))
        return out

    def keyframe_counts(self):
        return [fe.next_kf for fe in self.fes]
