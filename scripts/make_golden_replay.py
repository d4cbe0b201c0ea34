"""Record the golden-replay fixture: the single-threaded facade's
trajectory over the canonical loop sequence (tests/golden_replay.py).

Run on the CPU backend (same backend the test tier uses):
    python scripts/make_golden_replay.py
Writes tests/fixtures/golden_replay.npz. Commit the result.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from golden_replay import FIXTURE, run_st_replay  # noqa: E402


def main():
    assert jax.default_backend() == "cpu", jax.devices()
    per_scan, trajectory, n_loops = run_st_replay()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, per_scan_poses=per_scan,
                        trajectory=trajectory,
                        n_loop_edges=np.int32(n_loops))
    drift = np.linalg.norm(per_scan[-1][:3, 3] - per_scan[0][:3, 3])
    print(f"wrote {FIXTURE}: {per_scan.shape[0]} scans, "
          f"{trajectory.shape[0]} keyframes, {n_loops} loop edges, "
          f"final-to-start distance {drift:.3f} m")


if __name__ == "__main__":
    main()
