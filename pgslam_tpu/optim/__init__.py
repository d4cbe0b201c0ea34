"""SE(3) pose-graph optimization (GTSAM replacement, SURVEY.md §2b N9)."""

from .pgo import PGOConfig, optimize_pose_graph  # noqa: F401
