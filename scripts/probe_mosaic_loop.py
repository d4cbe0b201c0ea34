"""Chip probe: sequencing strategies for the factored-incidence block
loop (lm_pallas) at the dense-4k stress shape.

The unrolled Vb-block loop spills: Mosaic hoists all Vb independent MXU
dots and keeps every [R, 2E] result live (129 MB of register-allocator
spill slots at V=4k/E=8k — the ENTIRE vmem). Candidates measured here:

  A. barrier  — unrolled python loop, jax.lax.optimization_barrier
                chaining (acc, X) each iteration so dot k+1 cannot hoist
                above the accumulate of dot k.
  B. fori     — jax.lax.fori_loop over vertex blocks: operand staged to
                VMEM scratch, dynamic lane slice [R, 128] per block,
                accumulate into a scratch ref; block mask from an
                id-row compare (no Bt slicing).

Both must be bit-identical to the numpy gather/scatter reference
(values are bf16-exact by construction; one-hot moves are exact).

Usage: python scripts/probe_mosaic_loop.py [V] [E2] [R]
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

_DEFAULT = jax.lax.Precision.DEFAULT


def gather_barrier_kernel(x_ref, w_ref, bid_ref, o_ref, *, Vb):
    f32 = jnp.float32
    Wm = w_ref[:]
    bid = bid_ref[0:1, :]
    Xb = x_ref[:].astype(jnp.bfloat16)
    acc = None
    for vb in range(Vb):
        T = jax.lax.dot_general(
            Xb[:, 128 * vb:128 * (vb + 1)], Wm, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        Tm = T * (bid == vb).astype(f32)
        acc = Tm if acc is None else acc + Tm
        acc, Xb = jax.lax.optimization_barrier((acc, Xb))
    o_ref[:] = acc


def gather_fori_kernel(x_ref, w_ref, bid_ref, o_ref, xs_ref, *, Vb):
    f32 = jnp.float32
    R = x_ref.shape[0]
    xs_ref[:] = x_ref[:]
    o_ref[:] = jnp.zeros_like(o_ref)

    def body(vb, _):
        Xvb = xs_ref[0:R, pl.ds(vb * 128, 128)].astype(jnp.bfloat16)
        T = jax.lax.dot_general(
            Xvb, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        o_ref[:] = o_ref[:] + T * (bid_ref[0:1, :] == vb).astype(f32)
        return 0

    jax.lax.fori_loop(0, Vb, body, 0)


def scatter_barrier_kernel(x_ref, w_ref, bid_ref, o_ref, *, Vb):
    f32 = jnp.float32
    Wm = w_ref[:]
    bid = bid_ref[0:1, :]
    Xs = x_ref[:]
    outs = []
    for vb in range(Vb):
        Z = (Xs * (bid == vb).astype(f32)).astype(jnp.bfloat16)
        Y = jax.lax.dot_general(
            Z, Wm, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        outs.append(Y)
        Y, Xs = jax.lax.optimization_barrier((Y, Xs))
        outs[-1] = Y
    o_ref[:] = jnp.concatenate(outs, axis=1)


def scatter_fori_kernel(x_ref, w_ref, bid_ref, o_ref, xs_ref, *, Vb):
    f32 = jnp.float32
    R = x_ref.shape[0]
    xs_ref[:] = x_ref[:]

    def body(vb, _):
        Z = (xs_ref[0:R, :]
             * (bid_ref[0:1, :] == vb).astype(f32)).astype(jnp.bfloat16)
        Y = jax.lax.dot_general(
            Z, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        o_ref[0:R, pl.ds(vb * 128, 128)] = Y
        return 0

    jax.lax.fori_loop(0, Vb, body, 0)


def gather_tiled_fori_kernel(x_ref, w_ref, bid_ref, o_ref, xs_ref, *,
                             s, trips):
    """Tiled one-hot overlay: W1 [2E, s] = OR of S's column tiles, tile
    recovered by the super-id mask. fori over V/s tiles."""
    f32 = jnp.float32
    R = x_ref.shape[0]
    xs_ref[:] = x_ref[:]
    o_ref[:] = jnp.zeros_like(o_ref)

    def body(t, _):
        Xt = xs_ref[0:R, pl.ds(t * s, s)].astype(jnp.bfloat16)
        T = jax.lax.dot_general(
            Xt, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        o_ref[:] = o_ref[:] + T * (bid_ref[0:1, :] == t).astype(f32)
        return 0

    jax.lax.fori_loop(0, trips, body, 0)


def gather_tiled_unroll_kernel(x_ref, w_ref, bid_ref, o_ref, *, s, trips):
    f32 = jnp.float32
    Xb = x_ref[:].astype(jnp.bfloat16)
    bid = bid_ref[0:1, :]
    acc = None
    for t in range(trips):
        T = jax.lax.dot_general(
            Xb[:, t * s:(t + 1) * s], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        Tm = T * (bid == t).astype(f32)
        acc = Tm if acc is None else acc + Tm
    o_ref[:] = acc


def scatter_tiled_fori_kernel(x_ref, w_ref, bid_ref, o_ref, xs_ref, *,
                              s, trips):
    f32 = jnp.float32
    R = x_ref.shape[0]
    xs_ref[:] = x_ref[:]

    def body(t, _):
        Z = (xs_ref[0:R, :]
             * (bid_ref[0:1, :] == t).astype(f32)).astype(jnp.bfloat16)
        Y = jax.lax.dot_general(
            Z, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        o_ref[0:R, pl.ds(t * s, s)] = Y
        return 0

    jax.lax.fori_loop(0, trips, body, 0)


def scatter_tiled_unroll_kernel(x_ref, w_ref, bid_ref, o_ref, *, s, trips):
    f32 = jnp.float32
    Xs = x_ref[:]
    bid = bid_ref[0:1, :]
    outs = []
    for t in range(trips):
        Z = (Xs * (bid == t).astype(f32)).astype(jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            Z, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT))
    o_ref[:] = jnp.concatenate(outs, axis=1)


def run_case(name, kernel, scratch, x, w, bid, out_shape, ref, Vb=None):
    if Vb is not None:
        kernel = functools.partial(kernel, Vb=Vb)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )
    t0 = time.perf_counter()
    try:
        o = jax.block_until_ready(f(x, w, bid))
    except Exception as e:
        print(f"{name}: FAIL compile/run: {str(e)[:300]}", flush=True)
        return
    tc = time.perf_counter() - t0
    err = float(np.abs(np.asarray(o) - ref).max())
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(x, w, bid)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.3f} ms, max err {err:.2e}, compile {tc:.0f}s",
          flush=True)


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    E2 = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    Vb = V // 128
    print(f"devices={jax.devices()} V={V} 2E={E2} R={R} Vb={Vb}",
          flush=True)
    rng = np.random.default_rng(0)
    # bf16-exact values so one-hot moves are exact
    x = rng.standard_normal((R, V), np.float32)
    x = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    xe = rng.standard_normal((R, E2), np.float32)
    xe = np.asarray(jnp.asarray(xe, jnp.bfloat16), np.float32)
    idx = rng.integers(0, V, E2)
    w = np.zeros((E2, 128), np.float32)
    w[np.arange(E2), idx % 128] = 1
    w = jnp.asarray(w, jnp.bfloat16)
    bid = (idx // 128).astype(np.float32)[None, :]

    g_ref = x[:, idx]                                   # [R, E2]
    s_ref = np.zeros((R, V), np.float32)
    np.add.at(s_ref.T, idx, xe.T)

    xj = jnp.asarray(x)
    xej = jnp.asarray(xe)
    wj = jnp.asarray(w)
    bj = jnp.asarray(bid)
    run_case("gather/barrier", gather_barrier_kernel, [], xj, wj, bj,
             (R, E2), g_ref, Vb)
    run_case("gather/fori", gather_fori_kernel,
             [pltpu.VMEM((R, V), jnp.float32)], xj, wj, bj,
             (R, E2), g_ref, Vb)
    run_case("scatter/barrier", scatter_barrier_kernel, [], xej, wj, bj,
             (R, V), s_ref, Vb)
    run_case("scatter/fori", scatter_fori_kernel,
             [pltpu.VMEM((R, E2), jnp.float32)], xej, wj, bj,
             (R, V), s_ref, Vb)

    # tiled one-hot overlay: W1 [2E, s] + super-id row
    for s in (512, 2048):
        if s > V or V % s:
            continue
        trips = V // s
        w1 = np.zeros((E2, s), np.float32)
        w1[np.arange(E2), idx % s] = 1
        w1 = jnp.asarray(w1, jnp.bfloat16)
        sid = jnp.asarray((idx // s).astype(np.float32)[None, :])
        run_case(f"gather/tiled_fori s={s}",
                 functools.partial(gather_tiled_fori_kernel,
                                   s=s, trips=trips),
                 [pltpu.VMEM((R, V), jnp.float32)], xj, w1, sid,
                 (R, E2), g_ref)
        run_case(f"gather/tiled_unroll s={s}",
                 functools.partial(gather_tiled_unroll_kernel,
                                   s=s, trips=trips),
                 [], xj, w1, sid, (R, E2), g_ref)
        run_case(f"scatter/tiled_fori s={s}",
                 functools.partial(scatter_tiled_fori_kernel,
                                   s=s, trips=trips),
                 [pltpu.VMEM((R, E2), jnp.float32)], xej, w1, sid,
                 (R, V), s_ref)
        run_case(f"scatter/tiled_unroll s={s}",
                 functools.partial(scatter_tiled_unroll_kernel,
                                   s=s, trips=trips),
                 [], xej, w1, sid, (R, V), s_ref)


if __name__ == "__main__":
    main()
