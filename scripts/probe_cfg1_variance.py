"""Config-1 session-variance probe (VERDICT r4 weak #3).

Config 1 (single 1k-pt ICP pair) is a dispatch-floor measurement: ~0
device compute, so it reads relay tenancy. Three back-to-back captures
of IDENTICAL code in one session quantify the in-session band; r5
measured 141.8 / 83.4 / 73.1 regs/s (a 1.9x swing, same 23 iterations
and bit-zero transform error every time) — which attributes r4's
319 -> 210 cross-session delta to the floor, not the framework.

Usage: python scripts/probe_cfg1_variance.py [n_reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

import bench_configs as bc


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(f"devices={jax.devices()}", flush=True)
    for rep in range(n):
        t0 = time.perf_counter()
        bc.config1_single_pair()
        print(f"rep {rep}: {time.perf_counter() - t0:.1f}s", flush=True)
    rates = [r["registrations_per_sec"] for r in bc.RESULTS]
    print(f"in-session config-1 band: {min(rates)}-{max(rates)} regs/s "
          f"({max(rates)/min(rates):.2f}x swing)", flush=True)


if __name__ == "__main__":
    main()
