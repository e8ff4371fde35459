"""Core math: Lie groups, camera models, analytic Jacobians (pure JAX)."""

from scavislam_tpu.core.lie import SE3, SO3  # noqa: F401
from scavislam_tpu.core.camera import LinearCamera, StereoCamera  # noqa: F401
