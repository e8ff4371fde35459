"""Block-matching disparity vs exact synthetic ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.ops.stereo import block_matching_disparity

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.35)


@pytest.fixture(scope="module")
def pair():
    seq = SyntheticSequence(CAM, n_frames=1)
    f = seq.frame(0)
    return f["left"], f["right"], f["disp_gt"]


class TestBlockMatching:
    def test_disparity_accuracy(self, pair):
        left, right, gt = pair
        disp = block_matching_disparity(left, right, num_disp=64, radius=5)
        d = np.asarray(disp)
        g = np.asarray(gt)
        valid = d > 0
        # Only compare where GT is in measurable range and away from borders.
        m = valid & (g > 1.0) & (g < 63.0)
        m[:8, :] = m[-8:, :] = False
        m[:, :8] = m[:, -8:] = False
        assert m.sum() > 2000, f"too few valid disparities: {m.sum()}"
        err = np.abs(d[m] - g[m])
        # median subpixel accuracy; a small fraction of outliers tolerated
        assert np.median(err) < 0.5, f"median err {np.median(err)}"
        assert (err < 2.0).mean() > 0.9, f"inlier rate {(err < 2.0).mean()}"

    def test_invalid_marked_negative(self, pair):
        left, right, _ = pair
        disp = block_matching_disparity(left, right, num_disp=64)
        d = np.asarray(disp)
        # leftmost columns can't match (no counterpart in right image)
        assert (d[:, :4] <= 0).all()

    def test_textureless_rejected(self):
        flat_l = jnp.full((96, 128), 0.5, jnp.float32)
        flat_r = jnp.full((96, 128), 0.5, jnp.float32)
        d = block_matching_disparity(flat_l, flat_r, num_disp=32)
        assert (np.asarray(d) <= 0).all()


class TestPallasKernel:
    def test_interpret_matches_xla(self, pair):
        """The fused Pallas kernel (interpret mode on CPU) must agree with
        the XLA formulation."""
        import numpy as np

        from scavislam_tpu.ops.stereo_pallas import (
            block_matching_disparity_pallas,
        )

        left, right, gt = pair
        dp = np.asarray(
            block_matching_disparity_pallas(
                left, right, num_disp=32, radius=5, interpret=True
            )
        )
        dx = np.asarray(
            block_matching_disparity(left, right, num_disp=32, radius=5)
        )
        both = (dp > 0) & (dx > 0)
        assert both.mean() > 0.5
        agree = np.abs(dp[both] - dx[both]) < 1.0
        assert agree.mean() > 0.97, agree.mean()
        # and both track ground truth
        g = np.asarray(gt)
        m = both & (g > 1) & (g < 31)
        if m.sum() > 100:
            err = np.abs(dp[m] - g[m])
            assert np.median(err) < 0.5
