import cProfile, pstats, io, time
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
except Exception:
    pass
import jax.numpy as jnp
from julius_tpu.tools.synth import flagship_engine, make_flagship_utts

batch = 64
eng, protos = flagship_engine(n_words=5000, n_phones=668,
                              hidden=2048, n_layers=5, trained=True)
truths, windows, lens_list = make_flagship_utts(
    eng.hmm, eng.voca, eng.lm, protos, batch, 120, 11,
    min_words=6, max_words=12, seed=1)
T = max(lens_list)
feats = np.zeros((batch, T, 120*11), np.float32)
for u, win in enumerate(windows):
    feats[u, :win.shape[0]] = win
feats = jax.device_put(jnp.asarray(feats))
lens = jax.device_put(jnp.asarray(lens_list, dtype=jnp.int32))
jax.block_until_ready(feats)
res = eng.decode_features(feats, lens)   # compile
pr = cProfile.Profile()
pr.enable()
res = eng.decode_features(feats, lens)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(35)
print(s.getvalue())
