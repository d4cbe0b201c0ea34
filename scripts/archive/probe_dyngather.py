"""Chip probe: does Mosaic's tpu.dynamic_gather work on this v5e at the
widths/dtypes the PGO kernels need?

JAX 0.9.0's Mosaic lowering maps 2D ``jnp.take_along_axis(x, idx, axis=1)``
(with idx.shape == x.shape) to ``tpu.dynamic_gather`` along lanes. If that
executes correctly at width 8k-32k for f32, the fused LM/PCG kernels can
replace every one-hot incidence matmul (the VMEM hog: S [2E, V] bf16
counted twice) with real gathers + degree-bounded adjacency sums, covering
8k-pose graphs in VMEM trivially.

Run on the real chip: python scripts/probe_dyngather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, flush=True)


def probe(rows, width, out_width, dtype):
    """Gather x[i, idx[i, j]] for j in [0, out_width) inside a kernel.

    Pads idx/x to a common width W = max(width, out_width) as the lowering
    requires idx.shape == x.shape.
    """
    W = max(width, out_width)

    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        if W > width:
            x = jnp.pad(x, ((0, 0), (0, W - width)))
        g = jnp.take_along_axis(
            x, idx_ref[:], axis=1,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        o_ref[:] = g[:, :out_width]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, width)), dtype)
    idx = jnp.asarray(rng.integers(0, width, size=(rows, W)), jnp.int32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, out_width), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, idx)
    out = np.asarray(jax.block_until_ready(out))
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx)[:, :out_width],
                             axis=1)
    ok = np.array_equal(out, ref)

    # timing
    f = jax.jit(lambda x, i: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((rows, out_width), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))(x, i))
    f(x, idx).block_until_ready()
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        r = f(x, idx)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n * 1e6
    log(f"  rows={rows} width={width} out={out_width} {np.dtype(dtype).name}:"
        f" ok={ok}  {dt:.0f} us/call")
    return ok


def main():
    log(f"backend: {jax.devices()}")
    cases = [
        (8, 1024, 4096, jnp.float32),     # V=1k gather to 2E=4k
        (8, 2048, 8192, jnp.float32),     # V=2k/E=4k
        (8, 8192, 32768, jnp.float32),    # V=8k/E=16k
        (16, 2048, 8192, jnp.float32),    # 16-row (transform) gather
        (8, 8192, 8192, jnp.float32),     # square case
        (8, 2048, 8192, jnp.int32),
    ]
    for rows, w, ow, dt in cases:
        try:
            probe(rows, w, ow, dt)
        except Exception as e:
            log(f"  rows={rows} width={w} out={ow}: FAILED {type(e).__name__}:"
                f" {str(e)[:300]}")


if __name__ == "__main__":
    main()
