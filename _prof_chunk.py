"""Measure one scan_words_store_win dispatch's device time per (W, K).

Scratch perf tool: times the jitted windowed scan with realistic
flagship shapes (N=21 nodes, R=2004+pseudo rows, T=340, B=64).
"""
import time

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
except Exception:
    pass
import jax.numpy as jnp
from functools import partial

from julius_tpu.search.scan import scan_words_store_win
from julius_tpu.utils.logadd import LOG_ZERO

B, T, R = 64, 340, 2100
N, KL1 = 21, 2
V = 5000
CAP = 16384
A = 16
rng = np.random.default_rng(0)

g_store = jnp.full((CAP, T), LOG_ZERO, jnp.float32)
beg_store = jnp.zeros((CAP, T), jnp.int32)
loc_all = jnp.asarray(rng.standard_normal((V + 1, KL1, N)).astype(np.float32))
ent_all = jnp.asarray(rng.standard_normal((V + 1, N)).astype(np.float32))
ext_all = jnp.asarray(rng.standard_normal((V + 1, N)).astype(np.float32))
sidx_all = jnp.asarray(rng.integers(0, R, (V + 1, N)).astype(np.int32))
out_flat = jnp.asarray(rng.standard_normal(B * T * R).astype(np.float32))

for W in (64, 128, 256, 340):
    for K in (256, 2048, 4096):
        ints = np.zeros((K, 6 + A), np.int32)
        ints[:, 0] = rng.integers(0, V, K)
        ints[:, 1] = rng.integers(0, CAP, K)
        ints[:, 2] = rng.integers(0, B, K)
        ints[:, 3] = rng.integers(0, CAP, K)
        ints[:, 4] = rng.integers(0, T - W + 1, K)
        ints[:, 6:] = rng.integers(0, T, (K, A))
        lm = np.zeros(K, np.float32)
        fn = jax.jit(partial(scan_words_store_win, W=W, T=T, R=R,
                             scan_beam=0.0), donate_argnums=(0, 1))
        t0 = time.perf_counter()
        g_store, beg_store, ga, ba, sa = fn(
            g_store, beg_store, loc_all, ent_all, ext_all, sidx_all,
            jnp.asarray(ints), jnp.asarray(lm), out_flat)
        jax.block_until_ready(ga)
        compile_s = time.perf_counter() - t0
        n_it = 5
        t0 = time.perf_counter()
        for _ in range(n_it):
            g_store, beg_store, ga, ba, sa = fn(
                g_store, beg_store, loc_all, ent_all, ext_all, sidx_all,
                jnp.asarray(ints), jnp.asarray(lm), out_flat)
        jax.block_until_ready(ga)
        dt = (time.perf_counter() - t0) / n_it
        print(f"W={W:4d} K={K:5d}: {dt*1e3:8.2f} ms/dispatch  "
              f"({dt/K*1e6:6.1f} us/chain)  compile {compile_s:.1f}s")
