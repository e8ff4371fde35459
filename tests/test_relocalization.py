"""Relocalization after tracking failure — capability beyond the reference
(which prints FAILURE! and exits, stereo_slam.cpp:706-710): the system
enters `lost` mode, BoW-queries each new frame against the keyframe index
with no covisibility exclusions, and re-seeds the pose on a passed
geometric check."""

import numpy as np
import pytest

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.pipeline.slam_system import SlamSystem
from scavislam_tpu.utils.config import Config

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)


def small_cfg():
    import dataclasses

    cfg = Config()
    return dataclasses.replace(
        cfg,
        frontend=dataclasses.replace(cfg.frontend, covis_thr=10),
        ui=dataclasses.replace(cfg.ui, parallax_thr=0.08),
    )


@pytest.mark.slow
class TestRelocalization:
    def test_recovers_from_kidnap(self):
        n = 14
        seq = SyntheticSequence(CAM, n_frames=n, step=0.02)
        system = SlamSystem(CAM, small_cfg(), threaded=False,
                            enable_loop_closure=True)

        frames = [seq.frame(i) for i in range(n)]
        system.process_first_frame(frames[0])
        for f in frames[1:10]:
            assert system.process_frame(dict(f))
        assert len(system.place_recognizer.location_map) >= 1
        assert not system.lost

        # kidnap: three frames of pure noise -> tracking failure -> lost
        rng = np.random.RandomState(0)
        h, w = 192, 256
        for k in range(3):
            noise = {
                "frame_id": 100 + k,
                "left": rng.rand(h, w).astype(np.float32),
                "right": rng.rand(h, w).astype(np.float32),
            }
            assert system.process_frame(noise)  # stays alive
        assert system.lost
        assert system.relocalizations == 0

        # wake up near frame 5's viewpoint: must relocalize and resume
        recov = dict(frames[5])
        recov["frame_id"] = 200
        assert system.process_frame(recov)
        assert not system.lost, "relocalization did not fire"
        assert system.relocalizations == 1
        T_est = dict(system.trajectory)[200]
        T_gt = frames[5]["T_cw_gt"]
        err = np.asarray((T_est @ T_gt.inverse()).t)
        # the reseed comes from 3-point RANSAC + Horn refine on BoW matches:
        # coarse (decimeters) but inside the guided matcher's capture basin
        assert np.linalg.norm(err) < 0.25, err

        # tracking continues from the recovered pose and REFINES it
        for i in range(6, 9):
            nxt = dict(frames[i])
            nxt["frame_id"] = 200 + i
            assert system.process_frame(nxt)
        assert not system.lost
        T_last = dict(system.trajectory)[208]
        err2 = np.asarray((T_last @ frames[8]["T_cw_gt"].inverse()).t)
        assert np.linalg.norm(err2) < 0.08, err2
        system.finish()
        system.shutdown()

    def test_unrecoverable_without_place_recognizer(self):
        n = 6
        seq = SyntheticSequence(CAM, n_frames=n, step=0.02)
        system = SlamSystem(CAM, small_cfg(), threaded=False,
                            enable_loop_closure=False)
        system.process_first_frame(seq.frame(0))
        for i in range(1, 4):
            assert system.process_frame(dict(seq.frame(i)))
        rng = np.random.RandomState(1)
        noise = {"frame_id": 50,
                 "left": rng.rand(192, 256).astype(np.float32),
                 "right": rng.rand(192, 256).astype(np.float32)}
        assert not system.process_frame(noise)  # reference-like: hard fail
        assert not system.tracking_ok
        system.shutdown()


@pytest.mark.slow
class TestMapReuse:
    def test_save_load_relocalize_continue(self, tmp_path):
        """Offline map reuse: map a sequence, checkpoint the FULL system,
        load it fresh, and localize+track against the prior map (the
        reference's persistence is assert(false) stubs)."""
        from scavislam_tpu.utils.serialization import (
            load_system,
            save_system,
        )

        n = 12
        seq = SyntheticSequence(CAM, n_frames=n, step=0.02)
        frames = [seq.frame(i) for i in range(n)]
        mapper = SlamSystem(CAM, small_cfg(), threaded=False,
                            enable_loop_closure=True)
        mapper.process_first_frame(frames[0])
        for f in frames[1:10]:
            assert mapper.process_frame(dict(f))
        assert len(mapper.place_recognizer.location_map) >= 1
        path = str(tmp_path / "map.npz")
        save_system(mapper, path)
        mapper.shutdown()

        system = load_system(path, CAM, small_cfg(), threaded=False,
                             enable_loop_closure=True)
        assert system.lost  # must localize against the prior map first
        assert len(system.place_recognizer.location_map) >= 1
        assert len(system.backend.graph.vertices) >= 2

        wake = dict(frames[5])
        wake["frame_id"] = 300
        assert system.process_frame(wake)
        assert not system.lost, "did not localize against the loaded map"
        T_est = dict(system.trajectory)[300]
        err = np.asarray((T_est @ frames[5]["T_cw_gt"].inverse()).t)
        assert np.linalg.norm(err) < 0.25, err

        # tracking continues against the LOADED map's candidates
        for i in range(6, 9):
            nxt = dict(frames[i])
            nxt["frame_id"] = 300 + i
            assert system.process_frame(nxt)
        assert not system.lost
        T_last = dict(system.trajectory)[308]
        err2 = np.asarray((T_last @ frames[8]["T_cw_gt"].inverse()).t)
        assert np.linalg.norm(err2) < 0.1, err2
        system.shutdown()
