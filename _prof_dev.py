import time
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
except Exception:
    pass
import jax.numpy as jnp
from julius_tpu.tools.synth import flagship_engine, make_flagship_utts
import julius_tpu.search.pass2_device as p2d

batch = 64
eng, protos = flagship_engine(n_words=5000, n_phones=668,
                              hidden=2048, n_layers=5, trained=True)
truths, windows, lens_list = make_flagship_utts(
    eng.hmm, eng.voca, eng.lm, protos, batch, 120, 11,
    min_words=6, max_words=12, seed=1)
T = max(lens_list)
feats = np.zeros((batch, T, 120 * 11), np.float32)
for u, win in enumerate(windows):
    feats[u, :win.shape[0]] = win
feats = jax.device_put(jnp.asarray(feats))
lens = jax.device_put(jnp.asarray(lens_list, dtype=jnp.int32))
jax.block_until_ready(feats)

tstats = {}
orig_prepare = p2d.prepare
def prep(*a, **k):
    t0 = time.perf_counter()
    out = orig_prepare(*a, **k)
    tstats["prepare"] = tstats.get("prepare", 0) + time.perf_counter() - t0
    return out
p2d.prepare = prep
orig_loop = p2d._astar_loop
def loop(*a, **k):
    t0 = time.perf_counter()
    out = orig_loop(*a, **k)
    jax.block_until_ready(out[0])
    tstats["loop"] = tstats.get("loop", 0) + time.perf_counter() - t0
    tstats["rounds"] = int(np.asarray(out[-1]))
    return out
p2d._astar_loop = loop
orig_bli = p2d._best_lm_in
def bli(*a, **k):
    t0 = time.perf_counter()
    out = orig_bli(*a, **k)
    tstats["best_lm_in"] = tstats.get("best_lm_in", 0) + time.perf_counter() - t0
    return out
p2d._best_lm_in = bli

res = eng.decode_features(feats, lens)   # compile
tstats.clear()
t0 = time.perf_counter()
res = eng.decode_features(feats, lens)
wall = time.perf_counter() - t0
correct = sum(
    1 for u in range(batch)
    if res[u].valid and [t for t in res[u].texts if t]
    == [w for w in truths[u] if w not in ("<s>", "</s>")])
print({"wall": round(wall, 2), **{k: (round(v, 2) if isinstance(v, float)
                                      else v) for k, v in tstats.items()},
       "exact": f"{correct}/{batch}"})
