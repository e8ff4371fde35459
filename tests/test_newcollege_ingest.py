"""Ingest parity for the reference's New College on-disk layout.

The reference consumes the New College dataset as rectified stereo PNMs
scanned recursively by regex (filegrabber.cpp:135-162: full path must match
`<base_str>left.<format_str>`; the companion right image is the same base +
`right.<fmt>`), with `data/newcollege.cfg` providing base_str=`.*rectified.*`
and format_str=`pnm`, and the files spread over per-segment subdirectories
(README:40-55: three wget'd StereoImages_* directories).

These tests generate a mock directory in EXACTLY that naming/format (P5
binary PNM, timestamped names, two segment subdirectories), drive it through
the native grabber with the reference's own config keys unmodified, and run
the full SLAM system over it — so a real New College download would run
unmodified. The rgbd variant covers the float-disparity PNG reinterpretation
(frame_grabber.cpp:153-162).
"""

import dataclasses
import os

import numpy as np
import pytest

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.io.filegrabber import FileGrabber, scan_dataset
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.utils.config import Config, load_config

# SAME camera/caps combo as tests/test_full_system.py — a new (shape, caps)
# pair would add a 5-25 s XLA compile to the suite
CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
N_FRAMES = 10


def _write_pnm(path, img_u8):
    h, w = img_u8.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(img_u8.tobytes())


@pytest.fixture()
def newcollege_mock(tmp_path):
    """Render synthetic stereo frames and lay them out exactly like the
    reference's New College tree: timestamped `...-rectified-left.pnm` /
    `...-rectified-right.pnm` pairs split across two segment directories."""
    seq = SyntheticSequence(CAM, n_frames=N_FRAMES, step=0.01)
    segs = [tmp_path / "StereoImages_1225720041_to_1225720118",
            tmp_path / "StereoImages_1225720118_to_1225720193"]
    for s in segs:
        s.mkdir()
    gts = []
    for i in range(N_FRAMES):
        f = seq.frame(i)
        gts.append(f["T_cw_gt"])
        seg = segs[i // (N_FRAMES // 2 + 1)]
        stamp = 1225720041.455302 + 0.05 * i
        base = seg / f"StereoImage__{stamp:.6f}-rectified-"
        for side in ("left", "right"):
            img = (np.clip(np.asarray(f[side]), 0, 1) * 255 + 0.5).astype(
                np.uint8)
            _write_pnm(str(base) + f"{side}.pnm", img)
    # a reference-format cfg pointing at the mock (same key names/syntax as
    # /root/reference/data/newcollege.cfg)
    cfg_path = tmp_path / "mock_newcollege.cfg"
    cfg_path.write_text(
        f"cam.width = 256;\ncam.height = 192;\ncam.f = 195.0;\n"
        f"cam.px = 127.0;\ncam.py = 95.0;\ncam.baseline = 0.12;\n"
        f"framepipe.path_str = {tmp_path};\n"
        "framepipe.base_str = .*rectified.*;\n"
        "framepipe.format_str = pnm;\n"
        "framepipe.right_img = 1;\n"
    )
    return tmp_path, cfg_path, gts


class TestNewCollegeLayout:
    def test_recursive_scan_order(self, newcollege_mock):
        root, _cfg, _gts = newcollege_mock
        # the grabber's derived pattern for the reference's config values
        files = scan_dataset(str(root), r".*rectified.*left.*\.pnm$")
        assert len(files) == N_FRAMES
        assert files == sorted(files)  # timestamp order == frame order
        assert all(f.endswith("-rectified-left.pnm") for f in files)
        # both segment subdirectories were found (recursive scan)
        assert len({os.path.dirname(f) for f in files}) == 2

    def test_grabber_pairs_reference_names(self, newcollege_mock):
        root, cfg_path, _gts = newcollege_mock
        cfg = load_config(str(cfg_path))
        assert cfg.framepipe.base_str == ".*rectified.*"
        g = FileGrabber(cfg.framepipe.path_str,
                        base_pattern=cfg.framepipe.base_str,
                        fmt=cfg.framepipe.format_str,
                        right_img=cfg.framepipe.right_img)
        assert len(g) == N_FRAMES
        for i in range(N_FRAMES):
            f = g.next_frame()
            assert f["frame_id"] == i
            assert f["left"].shape == (192, 256)
            assert f["right"].shape == (192, 256)
        g.close()

    def test_full_system_runs_reference_layout(self, newcollege_mock):
        """End-to-end: reference cfg -> native grabber -> SLAM -> trajectory
        export, on the reference layout unmodified."""
        from scavislam_tpu.pipeline.slam_system import SlamSystem, ate_rmse

        root, cfg_path, gts = newcollege_mock
        cfg = load_config(str(cfg_path))
        # runtime knobs mirror tests/test_full_system.py (compile reuse)
        cfg = dataclasses.replace(
            cfg,
            ui=dataclasses.replace(cfg.ui, parallax_thr=0.25),
            graph=dataclasses.replace(cfg.graph, inner_window=5,
                                      outer_window=20),
        )
        cam = StereoCamera.create(
            cfg.cam.f, (cfg.cam.px, cfg.cam.py),
            (cfg.cam.width, cfg.cam.height), cfg.cam.baseline)
        g = FileGrabber(cfg.framepipe.path_str,
                        base_pattern=cfg.framepipe.base_str,
                        fmt=cfg.framepipe.format_str,
                        right_img=cfg.framepipe.right_img)
        system = SlamSystem(cam, cfg, threaded=False,
                            enable_loop_closure=False)
        frames = [g.next_frame() for _ in range(N_FRAMES)]
        g.close()
        system.process_first_frame(frames[0])
        for f in frames[1:]:
            assert system.process_frame(f)
        system.finish()
        system.shutdown()
        traj = system.export_trajectory()
        assert traj.shape[0] == N_FRAMES
        ate = ate_rmse(system.trajectory, gts)
        assert np.isfinite(ate) and ate < 0.05, ate


class TestRgbdDispLayout:
    def test_float_disparity_reinterpret(self, tmp_path):
        """The rgbd variant: `<base>left.png` + `<base>disp.png` where the
        disp PNG's 4 channels are raw float32 bytes
        (frame_grabber.cpp:153-162)."""
        from PIL import Image

        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (48, 64), np.uint8)
        disp = (rng.rand(48, 64).astype(np.float32) * 30.0)
        Image.fromarray(img).save(tmp_path / "x-rgbd-left.png")
        Image.fromarray(
            disp.view(np.uint8).reshape(48, 64, 4), mode="RGBA"
        ).save(tmp_path / "x-rgbd-disp.png")
        g = FileGrabber(str(tmp_path), base_pattern=".*rgbd.*", fmt="png",
                        right_img=False, disp_img=True)
        f = g.next_frame()
        g.close()
        np.testing.assert_array_equal(f["disp"], disp)
