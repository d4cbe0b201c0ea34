"""Measure nn_pallas at each MXU precision on the current backend:
timing at flagship-relevant sizes + index agreement vs highest."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pgslam_tpu.ops.knn_pallas import nn_pallas

print("backend:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def timeit(fn, reps=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


for nq, nr in [(4096, 16384), (2048, 8192), (65536, 65536)]:
    # velodyne-like spread: +-60 m, worst case for low-precision coords
    Q = jnp.asarray(rng.uniform(-60, 60, (nq, 3)).astype(np.float32))
    R = jnp.asarray(Q[rng.integers(0, nq, nr)]
                    + rng.normal(0, 0.05, (nr, 3)).astype(np.float32))
    QM, RM = jnp.ones(nq, bool), jnp.ones(nr, bool)
    ref = None
    for prec in ["highest", "high", "default"]:
        dt, out = timeit(lambda p=prec: nn_pallas(Q, QM, R, RM, precision=p))
        ids = np.asarray(out.ids[:, 0])
        d2 = np.asarray(out.dists2[:, 0])
        if ref is None:
            ref = (ids, d2)
            agree, derr = 1.0, 0.0
        else:
            agree = float(np.mean(ids == ref[0]))
            derr = float(np.max(np.abs(np.sqrt(d2) - np.sqrt(ref[1]))))
        print(f"{nq}x{nr} {prec:8s}: {dt*1e3:8.3f} ms  "
              f"ids-agree {agree:.4f}  max |d - d_exact| {derr:.2e} m",
              flush=True)
