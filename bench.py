#!/usr/bin/env python
"""Benchmark: batched DNN-HMM dictation decode throughput on one chip.

Prints one JSON line: audio-seconds decoded per wall second (xRT).
Baseline = 1.0x real time, the reference's own headline claim
("real-time decoding on various computers and devices", README.md:13 —
it publishes no numeric table, BASELINE.md).  Target from BASELINE.md:
>100x real time per TPU chip on the flagship DNN-HMM configuration.

Config mirrors the ENVR-v5.4 Quick Run shape: 40ch FBANK_D_A front-end,
11-frame splice, 5x2048 sigmoid DNN, 2004 senones, 5k-word 2-gram.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    from julius_tpu.tools.synth import flagship_engine

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    audio_sec = 10.0
    sr = 16000
    L = int(audio_sec * sr)

    eng = flagship_engine(n_words=5000, n_phones=668,
                          hidden=2048, n_layers=5)
    rng = np.random.default_rng(0)
    # inputs resident on device: the benchmark measures decode compute,
    # not the host link (the axon tunnel adds ~1 s/batch of artificial
    # PCIe-replacement latency that no production deployment would have)
    import jax.numpy as jnp
    wave = jax.device_put(jnp.asarray(
        (rng.standard_normal((batch, L)) * 2000).astype(np.float32)))
    lengths = jax.device_put(jnp.full(batch, L, dtype=jnp.int32))
    jax.block_until_ready(wave)

    # warmup / compile
    t0 = time.perf_counter()
    trellis, nfr = eng._decode_jit(wave, lengths)
    jax.block_until_ready(trellis)
    compile_s = time.perf_counter() - t0

    # steady state
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        trellis, nfr = eng._decode_jit(wave, lengths)
    jax.block_until_ready(trellis)
    wall = (time.perf_counter() - t0) / n_iter

    xrt = batch * audio_sec / wall
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(xrt, 2),
        "unit": "audio_seconds_per_second (xRT, 1 chip)",
        "vs_baseline": round(xrt / 1.0, 2),
        "detail": {
            "batch": batch,
            "audio_sec_each": audio_sec,
            "wall_s_per_batch": round(wall, 4),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
