"""Standalone _astar_loop timing harness (no engine build): random
flagship-shaped inputs, fixed round count (no completions on junk), so
per-round device cost is wall / max_rounds.  P2D_ABLATE bitmask
isolates body blocks."""
import os
import sys
import time

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
except Exception:
    pass
import jax.numpy as jnp

import julius_tpu.search.pass2_device as p2d
from julius_tpu.search.ngram_device import DeviceNgram
from julius_tpu.utils.logadd import LOG_ZERO

B, T, R, V, NA = 64, 340, 2100, 5000, 10000
N, KL1 = 21, 2
S, P, CK = 500, int(os.environ.get("P2D_P", "8")), 64
CAPP = 2000
CA = min(p2d.CA_MAX, NA)
rng = np.random.default_rng(0)

loc = jnp.asarray(rng.standard_normal((V + 1, KL1, N)).astype(np.float32))
ent = jnp.asarray(rng.standard_normal((V + 1, N)).astype(np.float32))
ext = jnp.asarray(rng.standard_normal((V + 1, N)).astype(np.float32))
sidx = jnp.asarray(rng.integers(0, R, (V + 1, N)).astype(np.int32))
H = 1 << 16
ng = DeviceNgram(
    uni=jnp.asarray(-2 * rng.random(V).astype(np.float32)),
    bo_uni=jnp.zeros(V, jnp.float32),
    bi_keys=jnp.asarray(rng.integers(0, 1 << 30, H).astype(np.uint32)),
    bi_vals=jnp.asarray(-rng.random(H).astype(np.float32)),
    bi_rows=jnp.asarray(rng.integers(0, 1 << 30, (H, 2)).astype(np.int32)),
    n_words=V, bos_id=0, eos_id=1, unk_id=-1, wide=False)
wid2lm = jnp.asarray(np.arange(V + 1, dtype=np.int32) % V)
cprobv = jnp.zeros(V + 1, jnp.float32)
lm_opt = jnp.zeros(V + 1, jnp.float32)
out_ext = jnp.asarray(rng.standard_normal(B * T * R)
                      .astype(np.float32).reshape(B, T, R))
ab = jnp.asarray(np.sort(rng.integers(0, T - 1, (B, NA)), axis=1)
                 .astype(np.int32))
ae = jnp.asarray(np.minimum(
    np.sort(rng.integers(0, T - 1, (B, NA)), axis=1) + 20, T - 1)
    .astype(np.int32))
aw = jnp.asarray(rng.integers(2, V, (B, NA)).astype(np.int32))
ainc = jnp.asarray(-rng.random((B, NA)).astype(np.float32))
rest = jnp.asarray(-rng.random((B, T)).astype(np.float32) * 10)
cfm = jnp.asarray(np.cumsum(
    np.pad(rng.random((B, T)).astype(np.float32), ((0, 0), (1, 0))),
    axis=1))
last = jnp.full(B, T - 1, jnp.int32)
s_prio = jnp.asarray(-rng.random((B, S)).astype(np.float32) * 5)
s_w = jnp.asarray(rng.integers(2, V, (B, S)).astype(np.int32))
s_t = jnp.asarray(rng.integers(5, T // 2, (B, S)).astype(np.int32))
s_prev = jnp.asarray(rng.integers(0, V, (B, S)).astype(np.int32))
s_parent = jnp.full((B, S), -1, jnp.int32)
s_lm_add = jnp.zeros((B, S), jnp.float32)
s_lm_sum = jnp.zeros((B, S), jnp.float32)
s_row = jnp.full((B, S), -1, jnp.int32)
s_len = jnp.ones((B, S), jnp.int32)
stack0 = (s_prio, s_w, s_t, s_prev, s_parent, s_lm_add, s_lm_sum,
          s_row, s_len)

MR = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def run(mr):
    return p2d._astar_loop(
        loc, ent, ext, sidx, ng, wid2lm, cprobv, lm_opt, out_ext,
        ab, ae, aw, ainc,
        jnp.stack([ab.astype(jnp.float32), ae.astype(jnp.float32),
                   aw.astype(jnp.float32), ainc], axis=2),
        rest, cfm, last, stack0,
        P=P, S=S, CA=CA, CK=CK, CAPP=CAPP, max_rounds=mr,
        T=T, lr=5, tail=1, nbest=1, lw2=8.0, pen2=-2.0, wb=30)


t0 = time.perf_counter()
out = run(MR)
jax.block_until_ready(out[0])
print("compile+first:", round(time.perf_counter() - t0, 1),
      "rounds:", int(np.asarray(out[-1])))
t0 = time.perf_counter()
out = run(MR)
jax.block_until_ready(out[0])
dt = time.perf_counter() - t0
r = int(np.asarray(out[-1]))
print(f"ablate={os.environ.get('P2D_ABLATE', '0')} wall={dt:.2f}s "
      f"rounds={r} ms_per_round={1e3 * dt / max(1, r):.1f}")
