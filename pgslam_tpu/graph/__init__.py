"""Pose-graph state and graph algorithms.

Replaces the reference's Boost.Graph ``adjacency_list`` container
(``types.h:57``) and its Dijkstra/filtered-graph machinery
(SURVEY.md §2b N10) with a struct-of-arrays store owned by a single
host-side writer, plus vectorized/device-side distance queries.
"""

from .pose_graph import Keyframe, MapManager, PoseGraph  # noqa: F401
from .shortest_path import dijkstra  # noqa: F401
