"""Descriptors, RANSAC, bag-of-words place recognition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.models.placerec import PlaceRecognizer, train_vocabulary
from scavislam_tpu.ops.descriptors import compute_descriptors, match_descriptors
from scavislam_tpu.ops.image import sobel_xy
from scavislam_tpu.ops.ransac import ransac_se3, refine_se3_from_inliers

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
CAM_PARAMS = (CAM.focal, CAM.pp[0], CAM.pp[1], CAM.baseline)


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(CAM, n_frames=30, step=0.02)


class TestDescriptors:
    def test_normalized(self, seq):
        f = seq.frame(0)
        dx, dy = sobel_xy(f["left"])
        uv = jnp.asarray([[64.0, 64.0], [128.0, 96.0], [200.0, 150.0]])
        desc, ok = compute_descriptors(dx, dy, uv)
        assert desc.shape == (3, 128)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc), axis=1), 1.0, atol=1e-4
        )

    def test_same_patch_matches_self(self, seq):
        f = seq.frame(0)
        dx, dy = sobel_xy(f["left"])
        uv = jnp.asarray([[64.0, 64.0], [130.0, 100.0], [200.0, 150.0],
                          [90.0, 140.0]])
        desc, _ = compute_descriptors(dx, dy, uv)
        idx, ok = match_descriptors(desc, desc, ratio=0.9)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(4))

    def test_descriptors_stable_across_frames(self, seq):
        """Same 3-D point seen in neighboring frames -> similar descriptor."""
        f0, f1 = seq.frame(0), seq.frame(1)
        dx0, dy0 = sobel_xy(f0["left"])
        dx1, dy1 = sobel_xy(f1["left"])
        # pick image points in frame0, project their 3-D into frame1
        uv0 = jnp.asarray([[80.0, 80.0], [150.0, 100.0], [190.0, 140.0]])
        d = jnp.stack([f0["disp_gt"][int(v), int(u)] for u, v in np.asarray(uv0)])
        xyz0 = CAM.uv_disp_to_xyz(uv0[:, 0], uv0[:, 1], d)
        T_10 = f1["T_cw_gt"] @ f0["T_cw_gt"].inverse()
        uv1 = CAM.mono.project(T_10.apply(xyz0))
        d0, _ = compute_descriptors(dx0, dy0, uv0)
        d1, _ = compute_descriptors(dx1, dy1, uv1)
        sims = np.sum(np.asarray(d0) * np.asarray(d1), axis=1)
        assert (sims > 0.8).all(), sims


class TestRansac:
    def test_exact_correspondences(self):
        key = jax.random.PRNGKey(0)
        n = 64
        xyz_a = jnp.stack(
            [jax.random.uniform(key, (n,)) * 4 - 2,
             jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 2 - 1,
             jax.random.uniform(jax.random.fold_in(key, 2), (n,)) * 4 + 3],
            axis=-1,
        )
        T_gt = SE3.exp(jnp.asarray([0.3, -0.1, 0.2, 0.05, -0.1, 0.08]))
        xyz_b = T_gt.apply(xyz_a)
        R, t, inl, n_in = ransac_se3(
            key, xyz_a, xyz_b, jnp.ones(n, bool), CAM_PARAMS
        )
        assert int(n_in) > 0.9 * n
        err = (SE3(R, t) @ T_gt.inverse()).log()
        assert float(jnp.max(jnp.abs(err))) < 1e-3

    def test_with_outliers(self):
        key = jax.random.PRNGKey(1)
        n = 80
        xyz_a = jnp.stack(
            [jax.random.normal(key, (n,)),
             jax.random.normal(jax.random.fold_in(key, 1), (n,)),
             jax.random.uniform(jax.random.fold_in(key, 2), (n,)) * 4 + 3],
            axis=-1,
        )
        T_gt = SE3.exp(jnp.asarray([0.2, 0.1, -0.15, -0.03, 0.06, 0.02]))
        xyz_b = T_gt.apply(xyz_a)
        # corrupt 40%
        bad = jax.random.uniform(jax.random.fold_in(key, 3), (n,)) < 0.4
        xyz_b = jnp.where(
            bad[:, None],
            xyz_b + jax.random.normal(jax.random.fold_in(key, 4), (n, 3)) * 2.0,
            xyz_b,
        )
        R, t, inl, n_in = ransac_se3(
            key, xyz_a, xyz_b, jnp.ones(n, bool), CAM_PARAMS
        )
        T_ref = refine_se3_from_inliers(xyz_a, xyz_b, inl)
        err = (T_ref @ T_gt.inverse()).log()
        assert float(jnp.max(jnp.abs(err))) < 5e-3, np.asarray(err)


class TestKMeans:
    def test_clusters_separate_data(self):
        rng = np.random.RandomState(0)
        a = rng.randn(200, 128) * 0.05 + np.eye(128)[0]
        b = rng.randn(200, 128) * 0.05 + np.eye(128)[64]
        data = np.concatenate([a, b]).astype(np.float32)
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        vocab = train_vocabulary(data, k=2, iters=10)
        sims = data @ vocab.T
        assign = sims.argmax(1)
        # the two blobs land in different clusters
        assert assign[:200].std() < 0.2 and assign[200:].std() < 0.2
        assert assign[0] != assign[200]


class TestPlaceRecognition:
    def test_revisit_detected(self):
        """Index a full 360-degree lap, then revisit from the second lap:
        the recognizer must fire a loop with the GT relative pose — at the
        REFERENCE operating point (score 2.0 / 30 inliers, shipped trained
        vocabulary; placerecognizer.cpp:174-202,316). The TF-IDF score grows
        with index size (idf = n_docs / posting length), so the unmodified
        threshold needs a realistically-sized index — ~20 locations, like a
        real run's keyframe map — to separate revisits from distractors."""
        from scavislam_tpu.io.synthetic import closed_box

        n = 42  # two laps: frames 0..20 are the first 360-degree lap
        spin = SyntheticSequence(CAM, n_frames=n, kind="spin",
                                 planes=closed_box(), step=2.0 / (n - 1))
        pr = PlaceRecognizer(CAM)  # reference thresholds, shipped vocab
        for kf_id in range(21):  # index the full first lap
            f = spin.frame(kf_id)
            pr.add_location({
                "kf_id": kf_id,
                "img": f["left"],
                "disp": f["disp_gt"],
                "exclude": set(range(max(0, kf_id - 4), kf_id + 1)),
            })
        # query: second-lap frame 22 shares the heading of first-lap frame 1
        f = spin.frame(22)
        loop = pr.add_location({
            "kf_id": 99,
            "img": f["left"],
            "disp": f["disp_gt"],
            "exclude": {99},
        })
        assert loop is not None, "no loop detected on revisit"
        assert loop.loop_id in (1, 2), loop.loop_id
        # T_query_from_loop must match the GT relative pose
        T_gt = (f["T_cw_gt"]
                @ spin.frame(loop.loop_id)["T_cw_gt"].inverse())
        err = (loop.T_query_from_loop @ T_gt.inverse()).log()
        assert float(jnp.max(jnp.abs(err))) < 0.02, np.asarray(err)

    def test_no_loop_for_excluded_neighbors(self, seq):
        pr = PlaceRecognizer(CAM)  # reference thresholds, shipped vocab
        f0 = seq.frame(0)
        pr.add_location({"kf_id": 0, "img": f0["left"], "disp": f0["disp_gt"],
                         "exclude": {0}})
        f1 = seq.frame(1)
        loop = pr.add_location({
            "kf_id": 1, "img": f1["left"], "disp": f1["disp_gt"],
            # kf0 is covisible -> excluded -> no loop
            "exclude": {0, 1},
        })
        assert loop is None
