import sys, time
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
except Exception:
    pass
import jax.numpy as jnp
from julius_tpu.tools.synth import flagship_engine, make_flagship_utts
from julius_tpu.config import SearchConfig
import julius_tpu.search.pass2_device as p2d

mhp = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
batch = 64
eng, protos = flagship_engine(n_words=5000, n_phones=668,
                              hidden=2048, n_layers=5, trained=True)
eng.search_cfg.max_hypo_pop = mhp
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

tst = {}
orig_loop = p2d._astar_loop
def loop(*a, **k):
    t0 = time.perf_counter()
    out = orig_loop(*a, **k)
    jax.block_until_ready(out[0])
    tst["loop"] = time.perf_counter() - t0
    tst["rounds"] = int(np.asarray(out[-1]))
    return out
p2d._astar_loop = loop
res = eng.decode_features(feats, lens)
res = eng.decode_features(feats, lens)
correct = sum(
    1 for u in range(batch)
    if res[u].valid and [t for t in res[u].texts if t]
    == [w for w in truths[u] if w not in ("<s>", "</s>")])
print({"mhp": mhp, "loop_s": round(tst["loop"], 2),
       "rounds": tst["rounds"],
       "ms_per_round": round(1e3 * tst["loop"] / max(1, tst["rounds"]), 1),
       "exact": f"{correct}/{batch}"})
