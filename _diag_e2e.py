"""Round-structure profiler for the pass-2 rescan A* (scratch tool).

Times one flagship e2e batch on the current backend and breaks pass-2
wall into: device dispatch (async issue), blocking download, host-side
candidate/stack work.  Prints round count, chunk count, K histogram.
"""
import json
import time

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
except Exception:
    pass
import jax.numpy as jnp

from julius_tpu.tools.synth import flagship_engine, make_flagship_utts
import julius_tpu.search.pass2_rescan as p2r

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

stats = {"rounds": 0, "t_issue": 0.0, "t_block": 0.0, "K": [],
         "chunks": 0, "scans": 0}
orig_run = p2r.ScanDispatcher.run


def run(self, reqs):
    stats["rounds"] += 1
    stats["K"].append(len(reqs))
    t0 = time.perf_counter()
    out = orig_run(self, reqs)
    stats["t_block"] += time.perf_counter() - t0
    return out


p2r.ScanDispatcher.run = run

t0 = time.perf_counter()
res = eng.decode_features(feats, lens)
print("compile+first wall:", round(time.perf_counter() - t0, 1),
      "rounds:", stats["rounds"])

for k in stats:
    stats[k] = 0.0 if isinstance(stats[k], float) else (
        [] if isinstance(stats[k], list) else 0)

t0 = time.perf_counter()
res = eng.decode_features(feats, lens)
wall = time.perf_counter() - t0
K = np.asarray(stats["K"]) if stats["K"] else np.zeros(1)
correct = sum(
    1 for u in range(batch)
    if res[u].valid and [t for t in res[u].texts if t]
    == [w for w in truths[u] if w not in ("<s>", "</s>")])
print(json.dumps({
    "wall": round(wall, 2),
    "rounds": stats["rounds"],
    "t_in_run": round(stats["t_block"], 2),
    "t_host_astar": round(wall - stats["t_block"], 2),
    "K_mean": round(float(K.mean()), 1),
    "K_max": int(K.max()),
    "K_sum": int(K.sum()),
    "exact": f"{correct}/{batch}",
    "backend": jax.default_backend(),
}))
