"""Stage-level profiler for the decode pipeline.

Reference observability is jlog timing prints (SURVEY.md §5.1); here
each pipeline stage is timed on device (compile excluded) and an
optional XLA trace is captured for xprof/tensorboard
(`jax.profiler.trace`).

    python -m julius_tpu.tools.profile [--trace DIR] [--batch N]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def profile_stages(engine, wave: np.ndarray, lengths: np.ndarray,
                   n_iter: int = 3) -> dict:
    """Per-stage steady-state timings (seconds per batch)."""
    import jax
    import jax.numpy as jnp
    from julius_tpu.search import pass1 as p1
    from functools import partial

    wave_j = jnp.asarray(wave, dtype=jnp.float32)
    len_j = jnp.asarray(lengths, dtype=jnp.int32)
    out = {}

    def timeit(name, fn, *args):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = fn(*args)
        jax.block_until_ready(r)
        out[name] = (time.perf_counter() - t0) / n_iter
        return r

    feats, mask = timeit("features", jax.jit(engine._features),
                         wave_j, len_j)
    out_ext = timeit("outprob", jax.jit(engine._outprob), feats)
    nfr = jnp.sum(mask.astype(jnp.int32), axis=-1)
    trellis = timeit("pass1", jax.jit(partial(
        p1.pass1_batch, engine.dev_net, engine.ngram_dev,
        engine.p1_cfg)), out_ext, nfr)
    t0 = time.perf_counter()
    engine._results(trellis, np.asarray(nfr))
    out["pass2+host"] = time.perf_counter() - t0
    out["total"] = sum(out.values())
    audio_s = float(np.sum(lengths)) / engine.fe_cfg.sample_rate
    out["xRT"] = audio_s / out["total"]
    return out


def main(argv=None):
    import jax
    from julius_tpu.tools.synth import flagship_engine

    argv = argv if argv is not None else sys.argv[1:]
    trace_dir = None
    batch = 32
    i = 0
    while i < len(argv):
        if argv[i] == "--trace":
            trace_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--batch":
            batch = int(argv[i + 1])
            i += 2
        else:
            i += 1

    eng = flagship_engine(n_words=5000, n_phones=668,
                          hidden=2048, n_layers=5)
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((batch, 160000)) * 2000).astype(np.float32)
    lengths = np.full(batch, 160000, dtype=np.int32)

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            stats = profile_stages(eng, wave, lengths, n_iter=1)
        print(f"xplane trace written to {trace_dir} "
              "(view with xprof / tensorboard)")
    else:
        stats = profile_stages(eng, wave, lengths)
    for k, v in stats.items():
        if k == "xRT":
            print(f"{k:12s} {v:10.1f}x")
        else:
            print(f"{k:12s} {v * 1000:10.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
