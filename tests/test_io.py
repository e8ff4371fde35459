"""IO: native PNM decode, dataset scan, prefetching grabber, config parsing."""

import os

import numpy as np
import pytest

from scavislam_tpu.io.filegrabber import (
    FileGrabber,
    depth_to_disp,
    disparity_from_png_bytes,
    load_image,
    scan_dataset,
)
from scavislam_tpu.utils.config import Config, load_config


@pytest.fixture()
def dataset(tmp_path):
    """Write a small PNM stereo dataset."""
    rng = np.random.RandomState(0)
    for i in range(5):
        for side in ("left", "right"):
            img = rng.randint(0, 255, (48, 64), np.uint8)
            p = tmp_path / f"img_{i:06d}_{side}.pgm"
            with open(p, "wb") as f:
                f.write(b"P5\n64 48\n255\n")
                f.write(img.tobytes())
    return tmp_path


class TestNativeIO:
    def test_scan(self, dataset):
        files = scan_dataset(str(dataset), r"img_.*left.*\.pgm$")
        assert len(files) == 5
        assert files == sorted(files)

    def test_pnm_decode(self, dataset):
        files = scan_dataset(str(dataset), r"img_.*left.*\.pgm$")
        img = load_image(files[0])
        assert img.shape == (48, 64)
        assert img.dtype == np.uint8

    def test_grabber_order_and_pairing(self, dataset):
        g = FileGrabber(str(dataset), base_pattern="img_.*", fmt="pgm",
                        right_img=True)
        assert len(g) == 5
        for i in range(5):
            f = g.next_frame()
            assert f["frame_id"] == i
            assert f["left"].shape == (48, 64)
            assert f["right"].shape == (48, 64)
            assert 0.0 <= f["left"].min() and f["left"].max() <= 1.0
        assert g.next_frame() is None
        g.close()

    def test_grabber_mono_device_prefetch(self, dataset):
        """right_img=False + device_prefetch uploads a single left uint8
        plane (left_dev) — the mono_vo pipelined path; the stereo stacked
        upload must NOT be built (no zero-padded right plane shipped)."""
        g = FileGrabber(str(dataset), base_pattern="img_.*", fmt="pgm",
                        right_img=False, device_prefetch=True)
        for i in range(5):
            f = g.next_frame()
            assert "left_dev" in f and "stacked_dev" not in f
            dev = np.asarray(f["left_dev"])
            assert dev.dtype == np.uint8 and dev.shape == (48, 64)
            np.testing.assert_array_equal(
                dev, (f["left"] * 255.0 + 0.5).astype(np.uint8))
        g.close()

    def test_disparity_reinterpret_roundtrip(self):
        d = np.random.RandomState(1).rand(8, 10).astype(np.float32) * 60
        raw = d.view(np.uint8).reshape(8, 10, 4)
        back = disparity_from_png_bytes(raw)
        np.testing.assert_array_equal(back, d)

    def test_depth_to_disp(self):
        z = np.array([[2.0, 4.0], [0.0, 8.0]], np.float32)
        d = depth_to_disp(z, focal=100.0, baseline=0.5)
        np.testing.assert_allclose(d[0], [25.0, 12.5])
        assert d[1, 0] < 0  # invalid depth -> invalid disparity


class TestConfig:
    def test_defaults(self):
        cfg = Config()
        assert cfg.graph.inner_window == 15
        assert cfg.use_n_levels_in_frontent == 3

    def test_load_reference_newcollege(self):
        cfg = load_config("/root/reference/data/newcollege.cfg")
        assert cfg.cam.width == 512 and cfg.cam.height == 384
        assert abs(cfg.cam.f - 389.956085) < 1e-5
        assert abs(cfg.cam.baseline - 0.120005) < 1e-7
        assert cfg.graph.inner_window == 30
        assert cfg.graph.outer_window == 200
        assert cfg.frontend.covis_thr == 25
        assert cfg.frontend.new_keyframe_pixel_thr == 70
        assert abs(cfg.ui.parallax_thr - 0.75) < 1e-7  # ui_parallax_thr sic
        assert cfg.framepipe.format_str == "pnm"
        assert cfg.framepipe.base_str == ".*rectified.*"

    def test_load_reference_rgbd(self):
        cfg = load_config("/root/reference/data/rgbd_example.cfg")
        assert cfg.cam.width == 640
        assert abs(cfg.cam.baseline - 0.07468) < 1e-7
        assert cfg.graph.inner_window == 7
        assert cfg.framepipe.disp_img is True
        assert cfg.framepipe.right_img is False
        assert abs(cfg.ui.parallax_thr - 0.15) < 1e-7
        assert abs(cfg.ui.max_reproj_error - 3.0) < 1e-7


class TestRgbdGrabber:
    """Live RGB-D grabber monitor semantics (rgbd_grabber.cpp:15-41):
    latest-frame-wins under a mutex, polling consumer."""

    def test_latest_value_polling(self):
        import numpy as np
        from scavislam_tpu.io.rgbd_grabber import RgbdGrabber

        frames = iter(range(100))

        def source():
            i = next(frames, None)
            if i is None:
                return None
            rgb = np.full((4, 4), i, np.uint8)
            disp = np.full((4, 4), float(i), np.float32)
            return rgb, disp

        g = RgbdGrabber()
        g.start(source, fps=500.0)
        import time
        got = []
        t0 = time.time()
        while len(got) < 5 and time.time() - t0 < 5.0:
            f = g.getFrame()
            if f is not None:
                rgb, disp = f
                assert rgb[0, 0] == int(disp[0, 0])
                got.append(int(rgb[0, 0]))
            time.sleep(0.005)
        g.stop()
        assert len(got) == 5
        # frames are the NEWEST at poll time: strictly increasing
        assert all(b > a for a, b in zip(got, got[1:]))
        # a second poll with no new frame returns None
        g2 = RgbdGrabber()
        assert g2.getFrame() is None

    def test_directory_replay_source(self, tmp_path):
        import numpy as np
        from scavislam_tpu.apps.dump_sequence import record
        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.io.rgbd_grabber import RgbdGrabber, directory_source
        from scavislam_tpu.io.synthetic import SyntheticSequence

        cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
        seq = SyntheticSequence(cam, n_frames=3, step=0.01)
        record(iter(seq), str(tmp_path), with_disp=True)

        g = RgbdGrabber()
        g.start(directory_source(str(tmp_path)), fps=200.0)
        import time
        f = None
        t0 = time.time()
        while f is None and time.time() - t0 < 5.0:
            f = g.getFrame()
            time.sleep(0.005)
        g.stop()
        assert f is not None
        rgb, disp = f
        assert rgb.shape[:2] == (192, 256)
        assert disp.shape == (192, 256)
        assert np.isfinite(disp).all()


class TestNativePng:
    def test_native_png_decode_matches_pil(self, tmp_path):
        """The C++ grabber decodes 8-bit non-interlaced PNG (gray/RGB/RGBA,
        all filter types) bit-exactly; exotic formats fall back to PIL."""
        from PIL import Image

        from scavislam_tpu.io.filegrabber import _native, load_image

        if _native() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.RandomState(0)
        cases = {
            "gray": rng.randint(0, 256, (48, 64), np.uint8),
            "rgb": rng.randint(0, 256, (33, 57, 3), np.uint8),
            "rgba": rng.randint(0, 256, (24, 31, 4), np.uint8),
            # smooth gradients exercise the Sub/Up/Average/Paeth filters
            "smooth": np.tile(np.arange(256, dtype=np.uint8), (40, 1)),
        }
        for name, arr in cases.items():
            p = str(tmp_path / f"{name}.png")
            Image.fromarray(arr).save(p)
            np.testing.assert_array_equal(
                load_image(p), np.asarray(Image.open(p)), err_msg=name)


class TestDegradation:
    """io/synthetic.Degradation — the sensor/scene model behind
    benchmarks/robustness.py (real New College imagery has these effects;
    the analytic renders are otherwise photometrically exact)."""

    def _cam(self):
        from scavislam_tpu.core.camera import StereoCamera

        return StereoCamera.create(60.0, (31.5, 23.5), (64, 48), 0.12)

    def test_deterministic_per_frame(self):
        from scavislam_tpu.io.synthetic import Degradation, SyntheticSequence

        deg = Degradation(noise_std=0.03, exposure_amp=0.1, vignette=0.3,
                          occluder_frac=0.25)
        seq = SyntheticSequence(self._cam(), n_frames=6, degrade=deg)
        a = seq.frame(2)
        b = seq.frame(2)
        np.testing.assert_array_equal(np.asarray(a["left"]),
                                      np.asarray(b["left"]))
        # noise is independent across frames and eyes
        c = seq.frame(3)
        assert np.abs(np.asarray(a["left"]) - np.asarray(c["left"])).max() > 0
        assert np.abs(np.asarray(a["left"]) - np.asarray(a["right"])).max() > 0

    def test_noise_std_calibrated(self):
        from scavislam_tpu.io.synthetic import Degradation, SyntheticSequence

        cam = self._cam()
        clean = SyntheticSequence(cam, n_frames=4).frame(1)
        noisy = SyntheticSequence(
            cam, n_frames=4, degrade=Degradation(noise_std=0.05)).frame(1)
        d = np.asarray(noisy["left"]) - np.asarray(clean["left"])
        # measure away from the [0,1] clip
        interior = (np.asarray(clean["left"]) > 0.15) & (
            np.asarray(clean["left"]) < 0.85)
        assert interior.sum() > 200
        assert 0.035 < d[interior].std() < 0.065

    def test_exposure_gain_is_exact(self):
        from scavislam_tpu.io.synthetic import Degradation, SyntheticSequence

        cam = self._cam()
        deg = Degradation(exposure_amp=0.2, exposure_period=40.0)
        i = 10  # sin peak: gain = 1 + amp
        clean = SyntheticSequence(cam, n_frames=12).frame(i)
        exposed = SyntheticSequence(cam, n_frames=12, degrade=deg).frame(i)
        cl = np.asarray(clean["left"])
        ex = np.asarray(exposed["left"])
        interior = (cl > 0.1) & (cl * 1.2 < 0.999)
        np.testing.assert_allclose(ex[interior] / cl[interior], 1.2,
                                   atol=1e-3)

    def test_motion_blur_softens_gradients(self):
        from scavislam_tpu.io.synthetic import Degradation, SyntheticSequence

        cam = self._cam()
        clean = np.asarray(SyntheticSequence(cam, n_frames=3).frame(1)["left"])
        blurred = np.asarray(SyntheticSequence(
            cam, n_frames=3,
            degrade=Degradation(motion_blur=1.0)).frame(1)["left"])
        gu = lambda im: np.abs(np.diff(im, axis=1)).mean()
        gv = lambda im: np.abs(np.diff(im, axis=0)).mean()
        ru = gu(blurred) / gu(clean)
        rv = gv(blurred) / gv(clean)
        # horizontal (motion-direction) gradients soften hard, and the blur
        # is DIRECTIONAL: vertical gradients survive much better (the
        # diagonal synthetic texture couples the axes, so compare ratios)
        assert ru < 0.6, ru
        assert rv > 1.5 * ru, (ru, rv)

    def test_occluder_consistent_geometry(self):
        from scavislam_tpu.io.synthetic import Degradation, SyntheticSequence

        cam = self._cam()
        deg = Degradation(occluder_frac=0.25, occluder_depth=1.2)
        f = SyntheticSequence(cam, n_frames=8, degrade=deg).frame(4)
        disp = np.asarray(f["disp_gt"])
        depth = np.asarray(f["depth_gt"])
        d_occ = cam.focal * cam.baseline / 1.2
        box = np.isclose(disp, d_occ, atol=1e-4)
        side = 0.25 * 64
        # the occluder occupies ~side^2 pixels and carries its own depth
        assert 0.5 * side * side < box.sum() < 2.0 * side * side
        np.testing.assert_allclose(depth[box], 1.2, atol=1e-5)


class TestClutteredScene:
    """Free-standing primitives (Box/Sphere) in io/synthetic: renders must
    contain true INTERIOR occlusion boundaries and depth discontinuities —
    the real-imagery property textured planes alone never produce
    (the reference validates on New College, /root/reference/README:181-197)."""

    def _cam(self):
        from scavislam_tpu.core.camera import StereoCamera

        return StereoCamera.create(60.0, (31.5, 23.5), (64, 48), 0.12)

    def test_interior_depth_discontinuities(self):
        from scavislam_tpu.core.lie import SE3
        from scavislam_tpu.io.synthetic import (
            cluttered_room,
            default_room,
            render_stereo_frame,
        )

        cam = self._cam()
        left, right, disp, depth = map(np.asarray, render_stereo_frame(
            cluttered_room(0), SE3.identity(), cam))
        lp, rp, dp_, zp = map(np.asarray, render_stereo_frame(
            default_room(), SE3.identity(), cam))
        assert np.isfinite(depth).all() and (depth > 0.1).all()
        assert np.abs(left - lp).max() > 0.01, "no object visible"
        # interior disparity jumps (off the image border): planes-only
        # scenes are piecewise-smooth with small gradients; objects write
        # multi-pixel jumps at their silhouettes
        int_g = np.abs(np.diff(disp, axis=1))[4:-4, 4:-4]
        pla_g = np.abs(np.diff(dp_, axis=1))[4:-4, 4:-4]
        assert pla_g.max() < 1.0, "planes scene unexpectedly discontinuous"
        assert (int_g > 2.0).sum() >= 10, "no interior disparity jumps"
        # disparity stays exact: where the left eye sees an object nearer
        # than the wall, the right eye shifted by disp sees the same texture
        # (photometric consistency across the stereo pair at depth edges)
        assert np.isfinite(disp).all()

    def test_sphere_and_box_intersections(self):
        import jax.numpy as jnp

        from scavislam_tpu.io.synthetic import (
            Box,
            Sphere,
            _intersect_box,
            _intersect_sphere,
        )

        origin = jnp.asarray(np.zeros(3, np.float32))
        dirs = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, -1.0],
                                     [1.0, 0, 0]], np.float32))
        box = Box(jnp.asarray(np.float32([-0.5, -0.5, 2.0])),
                  jnp.asarray(np.float32([0.5, 0.5, 3.0])),
                  jnp.float32(0.0))
        t = np.asarray(_intersect_box(origin, dirs, box))
        np.testing.assert_allclose(t[0], 2.0, atol=1e-5)
        assert np.isinf(t[1]) and np.isinf(t[2])
        sp = Sphere(jnp.asarray(np.float32([0, 0, 4.0])), jnp.float32(1.0),
                    jnp.float32(0.0))
        t = np.asarray(_intersect_sphere(origin, dirs, sp))
        np.testing.assert_allclose(t[0], 3.0, atol=1e-4)
        assert np.isinf(t[1]) and np.isinf(t[2])
        # ray starting inside the sphere exits through the far surface
        t_in = np.asarray(_intersect_sphere(
            jnp.asarray(np.float32([0, 0, 4.0])), dirs, sp))
        np.testing.assert_allclose(t_in[0], 1.0, atol=1e-4)


class TestLiveDumpLoop:
    """The reference's record->replay workflow as a LOOP
    (dump_rgbd.cpp:69-126, README:233-242): a live RgbdGrabber (synthetic
    camera standing in for OpenNI) -> record_live -> byte-exact dump ->
    replayed as a live source -> re-recorded identically."""

    def test_live_capture_record_replay_rerecord(self, tmp_path):
        import time

        import numpy as np

        from scavislam_tpu.apps.dump_sequence import record_live
        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.io.filegrabber import FileGrabber
        from scavislam_tpu.io.rgbd_grabber import (
            RgbdGrabber,
            directory_source,
        )
        from scavislam_tpu.io.synthetic import SyntheticSequence

        cam = StereoCamera.create(60.0, (31.5, 23.5), (64, 48), 0.12)
        n = 4
        seq = SyntheticSequence(cam, n_frames=n, step=0.01)
        rendered = []
        state = {"i": 0}

        def camera():
            i = state["i"]
            if i >= n:
                return None
            f = seq.frame(i)
            state["i"] += 1
            left = (np.clip(np.asarray(f["left"]), 0, 1) * 255
                    + 0.5).astype(np.uint8)
            disp = np.asarray(f["disp_gt"], np.float32)
            rendered.append((left, disp))
            return left, disp

        dump1 = str(tmp_path / "rec1")
        g = RgbdGrabber()
        g.start(camera, fps=60.0)
        try:
            got = record_live(g, dump1, n, timeout=20.0)
        finally:
            g.stop()
        assert got >= 2  # latest-value grabber may drop frames (reference
        # semantics); the recorder polls faster than capture so usually 0

        # replay the dump through the native FileGrabber: disparity must
        # round-trip BYTE-EXACTLY (float reinterpret, dump_rgbd.cpp:200-218)
        fg = FileGrabber(dump1, base_pattern="img_.*", fmt="png",
                         right_img=False, disp_img=True)
        f0 = fg.next_frame()
        assert f0 is not None
        # FileGrabber returns float [0,1] (u8/255); round-trip to u8 is exact
        replay_u8 = (np.asarray(f0["left"]) * 255 + 0.5).astype(np.uint8)
        lefts = {tuple(np.asarray(l).ravel()[:16]): (l, d)
                 for l, d in rendered}
        key = tuple(replay_u8.ravel()[:16])
        assert key in lefts, "replayed frame not among captured frames"
        src_l, src_d = lefts[key]
        np.testing.assert_array_equal(replay_u8, src_l)
        np.testing.assert_array_equal(
            np.asarray(f0["disp"], np.float32), src_d)

        # close the loop: the dump replayed AS a live source, re-recorded
        dump2 = str(tmp_path / "rec2")
        g2 = RgbdGrabber()
        g2.start(directory_source(dump1), fps=200.0)
        try:
            got2 = record_live(g2, dump2, got, timeout=20.0)
        finally:
            g2.stop()
        assert got2 >= 1
        fg2 = FileGrabber(dump2, base_pattern="img_.*", fmt="png",
                          right_img=False, disp_img=True)
        r0 = fg2.next_frame()
        assert r0 is not None
        assert np.asarray(r0["left"]).shape == (48, 64)
        assert np.isfinite(np.asarray(r0["disp"])).all()
