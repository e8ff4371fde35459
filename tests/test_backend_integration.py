"""Frontend + backend integration over a synthetic sequence, plus monitor
channel semantics."""

import numpy as np
import pytest

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.models.backend import Backend
from scavislam_tpu.models.frontend import StereoFrontend
from scavislam_tpu.pipeline.monitors import (
    FifoChannel,
    LatestValueCell,
    PlaceRecognizerMonitor,
    StackChannel,
)
from scavislam_tpu.utils.config import Config
import dataclasses

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)


class TestMonitors:
    def test_fifo(self):
        c = FifoChannel()
        c.push(1)
        c.push(2)
        assert c.pop() == 1 and c.pop() == 2 and c.pop() is None

    def test_latest_value_overwrites(self):
        c = LatestValueCell()
        c.set(1)
        c.set(2)
        assert c.take() == 2
        assert c.take() is None

    def test_stack(self):
        c = StackChannel()
        c.push(1)
        c.push(2)
        assert c.pop() == 2 and c.pop() == 1

    def test_place_monitor_keeps_newest_and_blocks_on_loop(self):
        m = PlaceRecognizerMonitor()
        m.addKeyframeData("a")
        m.addKeyframeData("b")
        assert m.getKeyframeDate() == "b"
        m.addLoop("loop1")
        m.addKeyframeData("c")  # refused: loop pending
        assert m.getKeyframeDate() is None
        assert m.getLoop() == "loop1"
        m.addKeyframeData("d")
        assert m.getKeyframeDate() == "d"

    def test_place_monitor_lossless_fifo(self):
        # benchmark mode: every keyframe is kept in order, none refused
        m = PlaceRecognizerMonitor(lossless=True)
        m.addKeyframeData("a")
        m.addKeyframeData("b")
        m.addLoop("loop1")
        m.addKeyframeData("c")  # NOT refused despite pending loop
        assert m.pending()
        assert m.getKeyframeDate() == "a"
        assert m.getKeyframeDate() == "b"
        assert m.getKeyframeDate() == "c"
        assert m.getLoop() == "loop1"
        assert not m.pending()


def run_system(n_frames=12, step=0.05):
    """Single-threaded frontend+backend stepping (deterministic)."""
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        frontend=dataclasses.replace(cfg.frontend, covis_thr=10),
        ui=dataclasses.replace(cfg.ui, parallax_thr=0.12),
        graph=dataclasses.replace(cfg.graph, inner_window=5, outer_window=20),
    )
    seq = SyntheticSequence(CAM, n_frames=n_frames, step=step)
    fe = StereoFrontend(CAM, cfg)
    be = Backend(CAM, cfg)

    f0 = seq.frame(0)
    pkt = fe.process_first_frame(f0)
    be.monitor.pushKeyframe(pkt)
    be.step()

    est, gt = [f0["T_cw_gt"]], [f0["T_cw_gt"]]
    for i in range(1, n_frames):
        f = seq.frame(i)
        # adopt backend neighborhood if available (stereo_slam.cpp:694-703)
        nb = be.monitor.getNeighborhood()
        if nb is not None:
            fe.apply_neighborhood(nb)
        success, dropped = fe.process_frame(f)
        assert success, f"tracking failed at frame {i}"
        if dropped:
            be.monitor.pushKeyframe(fe.to_optimizer_stack[-1])
            be.monitor.queryNeighborhood(fe.actkey_id)
        # run the backend "thread" synchronously until idle
        while be.step():
            pass
        est.append(fe._world_pose())
        gt.append(f["T_cw_gt"])
    return fe, be, est, gt


@pytest.fixture(scope="module")
def system():
    return run_system()


@pytest.mark.slow
class TestIntegration:
    def test_trajectory_ate(self, system):
        fe, be, est, gt = system
        errs = [np.linalg.norm(np.asarray((Te @ Tg.inverse()).t))
                for Te, Tg in zip(est, gt)]
        ate = float(np.sqrt(np.mean(np.square(errs))))
        assert ate < 0.03, f"ATE {ate}"

    def test_backend_graph_mirrors_keyframes(self, system):
        fe, be, est, gt = system
        assert set(be.graph.vertices) == set(fe.keyframe_map)
        assert len(be.graph.vertices) >= 2

    def test_backend_optimized(self, system):
        fe, be, est, gt = system
        # optimize ran at least once and improved or kept chi2
        assert be.graph.stats["chi2_final"] <= be.graph.stats["chi2_init"] + 1e-6

    def test_covis_edges_exist(self, system):
        fe, be, est, gt = system
        if len(be.graph.vertices) >= 2:
            assert len(be.graph.edges) >= len(be.graph.vertices) - 1

    def test_neighborhood_flows_back(self, system):
        fe, be, est, gt = system
        # after at least one query, the frontend adopted a neighborhood
        if len(be.graph.vertices) >= 2:
            assert fe.neighborhood is not None

    def test_bounded_device_memory(self, system):
        """Long-run memory discipline: the frontend keeps no per-keyframe
        device images by default (retention is opt-in for the debug
        keyframe view) and the backend's snapshot window is bounded."""
        fe, be, est, gt = system
        assert all("pyr" not in v and "disp" not in v
                   for v in fe.keyframe_map.values())
        assert len(be.keyframe_snapshots) <= be.SNAPSHOT_KEEP

    def test_snapshot_eviction_window(self, system):
        """_evict_snapshots keeps only the newest SNAPSHOT_KEEP entries."""
        fe, be, est, gt = system
        saved = dict(be.keyframe_snapshots), be.SNAPSHOT_KEEP
        try:
            be.keyframe_snapshots = {k: {"T_kw": None} for k in range(10)}
            be.SNAPSHOT_KEEP = 3
            be._evict_snapshots()
            assert sorted(be.keyframe_snapshots) == [7, 8, 9]
        finally:
            be.keyframe_snapshots, be.SNAPSHOT_KEEP = saved
