"""Mosaic feasibility probe for the factored-incidence PGO kernel.

The plan for VERDICT r4 item 2 (fused PGO past VMEM) replaces the
one-hot incidence S [2L, V] (the VMEM hog: 64-128 MB at dense 4k) with
its exact factorization S[e, v] = B[e, v//128] * W[e, v%128] — two
one-hots of size [2L, V/128] and [2L, 128] (64x smaller), applied as
block-select matmul + lane-select mask. The gather stage needs the pose
row [1, V] viewed as blocked [V/128, 128]; this probe checks which
reshape/relayout primitives Mosaic accepts on this chip:

  r1: [1, V] -> [Vb, 128] reshape             (gather input)
  r2: [Vb, 128] -> [1, V] reshape             (scatter output)
  t1: [128, Vb] -> [Vb, 128] transpose        (scatter epilogue)
  g1: full factored gather vs reference       (end-to-end check)

Run on the real chip. Interpret mode accepts everything; only the
Mosaic compile matters here.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend: {jax.devices()}", flush=True)
    V, Vb = 1024, 8
    x = np.arange(V, dtype=np.float32)[None, :]            # [1, V]

    def try_kernel(name, kern, out_shape, *args):
        try:
            out = pl.pallas_call(
                kern,
                out_shape=out_shape,
                interpret=jax.default_backend() == "cpu",
            )(*args)
            jax.block_until_ready(out)
            return out
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None

    # r1: lane -> sublane reshape
    def k_r1(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(Vb, 128)

    out = try_kernel("r1 [1,V]->[Vb,128] reshape", k_r1,
                     jax.ShapeDtypeStruct((Vb, 128), jnp.float32), x)
    if out is not None:
        ok = np.array_equal(np.asarray(out), x.reshape(Vb, 128))
        print(f"r1 [1,V]->[Vb,128] reshape: OK correct={ok}", flush=True)

    # r2: sublane -> lane reshape
    def k_r2(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1, V)

    out = try_kernel("r2 [Vb,128]->[1,V] reshape", k_r2,
                     jax.ShapeDtypeStruct((1, V), jnp.float32),
                     x.reshape(Vb, 128))
    if out is not None:
        ok = np.array_equal(np.asarray(out), x)
        print(f"r2 [Vb,128]->[1,V] reshape: OK correct={ok}", flush=True)

    # t1: [128, Vb] -> [Vb, 128] transpose
    def k_t1(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    xt = np.arange(128 * Vb, dtype=np.float32).reshape(128, Vb)
    out = try_kernel("t1 [128,Vb]->[Vb,128] transpose", k_t1,
                     jax.ShapeDtypeStruct((Vb, 128), jnp.float32), xt)
    if out is not None:
        ok = np.array_equal(np.asarray(out), xt.T)
        print(f"t1 transpose: OK correct={ok}", flush=True)

    # g1: full factored gather — xs[e] = x[ids[e]] via B (block one-hot,
    # bf16 matmul) + W (lane one-hot, mask+reduce).
    L = 256
    rng = np.random.default_rng(0)
    ids = rng.integers(0, V, L).astype(np.int32)
    Bh = np.zeros((L, Vb), np.float32)
    Bh[np.arange(L), ids // 128] = 1.0
    Wh = np.zeros((L, 128), np.float32)
    Wh[np.arange(L), ids % 128] = 1.0
    vals = rng.normal(size=(1, V)).astype(np.float32)

    def k_g1(x_ref, B_ref, W_ref, o_ref):
        Pk = x_ref[:].reshape(Vb, 128)                      # [Vb, 128]
        G = jax.lax.dot_general(
            B_ref[:].astype(jnp.bfloat16),
            Pk.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)            # [L, 128]
        xs = jnp.sum(G * W_ref[:], axis=1, keepdims=True)   # [L, 1]
        o_ref[:] = xs.T                                     # [1, L]

    out = try_kernel("g1 factored gather", k_g1,
                     jax.ShapeDtypeStruct((1, L), jnp.float32),
                     vals, Bh, Wh)
    if out is not None:
        want = vals[0, ids][None, :]
        # bf16 rounding of vals: compare against bf16-rounded reference
        want_bf = np.asarray(jnp.asarray(want).astype(jnp.bfloat16)
                             .astype(jnp.float32))
        got = np.asarray(out)
        print(f"g1 factored gather: OK max|err|(vs bf16 ref)="
              f"{np.abs(got - want_bf).max():.2e}", flush=True)

    # t2: [L, 1] -> [1, L] transpose (gather epilogue alternative)
    def k_t2(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    xc = np.arange(L, dtype=np.float32)[:, None]
    out = try_kernel("t2 [L,1]->[1,L] transpose", k_t2,
                     jax.ShapeDtypeStruct((1, L), jnp.float32), xc)
    if out is not None:
        ok = np.array_equal(np.asarray(out), xc.T)
        print(f"t2 transpose: OK correct={ok}", flush=True)


if __name__ == "__main__":
    main()
