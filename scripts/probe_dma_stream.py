"""Chip feasibility probe for HBM-streamed movement panels: a bf16
panel W [s, L] lives in HBM (memory_space=ANY); the kernel fori-loops
over L/cap column tiles, double-buffering [s, cap] tiles through VMEM
scratch and dotting X [R, s] against each tile — the movement pattern
the ranges-hbm PGO layout needs at 32k+ where the resident panels bust
VMEM. Checks bit-exactness vs the resident dot and measures the
streaming overhead.

Usage: python scripts/probe_dma_stream.py [s] [L] [R]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_stream_kernel(s, L, R, cap, n_reps):
    trips = L // cap

    def kern(x_ref, w_hbm, o_ref, buf, sems):
        # buf [2, s, cap] bf16; sems DMA((2,))
        def start(t, slot):
            pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(t * cap, cap)], buf.at[slot],
                sems.at[slot]).start()

        def wait(t, slot):
            pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(t * cap, cap)], buf.at[slot],
                sems.at[slot]).wait()

        def one_pass(r, _):
            start(0, 0)

            def body(t, _):
                slot = jax.lax.rem(t, 2)
                nxt = jax.lax.rem(t + 1, 2)

                @pl.when(t + 1 < trips)
                def _():
                    start(t + 1, nxt)

                wait(t, slot)
                o_ref[0:R, pl.ds(t * cap, cap)] = jax.lax.dot_general(
                    x_ref[0:R, :].astype(jnp.bfloat16), buf[slot],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                return 0

            jax.lax.fori_loop(0, trips, body, 0)
            return 0

        # n_reps passes so the per-dispatch floor amortizes out of the
        # measurement (the movement op runs hundreds of times per LM).
        jax.lax.fori_loop(0, n_reps, one_pass, 0)

    return kern


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cap = 128
    n_reps = 50
    print(f"devices={jax.devices()} s={s} L={L} R={R} cap={cap} "
          f"reps={n_reps}", flush=True)
    rng = np.random.default_rng(0)
    # one-hot-ish panel (exact payload movement like the real use)
    W = np.zeros((s, L), np.float32)
    W[rng.integers(0, s, L), np.arange(L)] = 1.0
    X = rng.normal(size=(R, s)).astype(np.float32)
    Xb = jnp.asarray(np.float32(
        np.asarray(jnp.asarray(X, jnp.bfloat16), np.float32)))  # exact bf16

    kern = make_stream_kernel(s, L, R, cap, n_reps)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max(8, R), L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, s, cap), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )
    Wb = jnp.asarray(W, jnp.bfloat16)
    t0 = time.perf_counter()
    out = f(Xb, Wb)
    jax.block_until_ready(out)
    print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    ref = np.asarray(Xb) @ W
    err = np.abs(np.asarray(out)[:R] - ref).max()
    print(f"max abs err vs resident reference: {err}", flush=True)
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(Xb, Wb)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / 5 / n_reps * 1e3)
    print(f"streamed movement pass: {min(dts):.4f} ms "
          f"(loops {dts[0]:.4f}/{dts[1]:.4f}; model tiles="
          f"{(s // 128) * (L // 128)})", flush=True)


if __name__ == "__main__":
    main()
