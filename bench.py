#!/usr/bin/env python
"""Benchmark: batched DNN-HMM dictation decode throughput on one chip.

Prints one JSON line: END-TO-END audio-seconds decoded per wall second
(xRT) — features in, final pass-2 N-best out, including the host A*
rounds and result assembly (pass-1-only xRT is in detail).  Inputs are
decodable generative utterances (synth.trained_dnn_weights prototypes),
so the second pass converges like it does on real speech instead of
burning its pop budget on noise.

vs_baseline compares against the reference C decoder's xRT measured
locally on this host via tools/refparity --scale flagship (BASELINE.md
records the measurement; the reference publishes no numbers).

Config mirrors the ENVR-v5.4 Quick Run shape: 40ch FBANK_D_A front-end,
11-frame splice, 5x2048 sigmoid DNN, 2004 senones, 5k-word 2-gram.
"""

import json
import os
import sys
import time

import numpy as np


def _ref_xrt() -> float:
    """Reference julius 4.6 xRT measured on this host (AVX/FMA + OpenMP,
    2 cores) on the same flagship config + generative inputs.  Read from
    BASELINE.json["measured"] (written by tools/refparity --scale
    flagship via --update-baseline); 4.1 was the round-3 measurement and
    stays as the fallback."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    try:
        with open(path) as f:
            return float(json.load(f)["measured"]["ref_xrt"])
    except Exception:
        return 4.1


REF_XRT = _ref_xrt()


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_bench_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    from julius_tpu.tools.synth import flagship_engine, make_flagship_utts

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    audio_sec = 10.0
    sr = 16000
    L = int(audio_sec * sr)

    eng, protos = flagship_engine(n_words=5000, n_phones=668,
                                  hidden=2048, n_layers=5, trained=True)
    rng = np.random.default_rng(0)

    # ---- pass-1-only path: waveform in, trellis out (front-end + DNN
    # + beam kernel, all on device).  Inputs resident on device: this
    # measures decode compute, not the host link (the axon tunnel adds
    # ~1 s/batch of artificial PCIe-replacement latency that no
    # production deployment would have).
    wave = jax.device_put(jnp.asarray(
        (rng.standard_normal((batch, L)) * 2000).astype(np.float32)))
    lengths = jax.device_put(jnp.full(batch, L, dtype=jnp.int32))
    jax.block_until_ready(wave)

    t0 = time.perf_counter()
    trellis, nfr, out_ext = eng._decode_jit(wave, lengths)
    jax.block_until_ready(trellis)
    compile_s = time.perf_counter() - t0

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        trellis, nfr, out_ext = eng._decode_jit(wave, lengths)
    jax.block_until_ready(trellis)
    p1_wall = (time.perf_counter() - t0) / n_iter
    p1_xrt = batch * audio_sec / p1_wall
    del trellis, nfr, out_ext, wave, lengths

    # ---- end-to-end path: decodable features in, final N-best out
    # (outprob + pass-1 + pass-2 acoustic-rescan A* + assembly)
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
    audio_e2e = sum(lens_list) / 100.0

    t0 = time.perf_counter()
    res = eng.decode_features(feats, lens)
    e2e_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = eng.decode_features(feats, lens)
    e2e_wall = time.perf_counter() - t0
    e2e_xrt = audio_e2e / e2e_wall

    # sanity: the bench must actually be decoding (not timing failures)
    correct = sum(
        1 for u in range(batch)
        if res[u].valid and [t for t in res[u].texts if t]
        == [w for w in truths[u] if w not in ("<s>", "</s>")])
    del res, feats, lens
    del eng

    # ---- 20k-word tied-triphone LVCSR config (VERDICT r4 #4: the
    # reference's 20k-word dictation capability, README.md:24):
    # HMMList logical triphones, pseudo CD sets, wide-key N-gram
    from julius_tpu.tools.synth import lvcsr_engine, make_lvcsr_utts
    lv = {}
    try:
        b2 = min(batch, 32)
        eng2, protos2 = lvcsr_engine(n_words=20000)
        truths2, windows2, lens2 = make_lvcsr_utts(
            eng2, protos2, b2, 120, 11, min_words=5, max_words=10, seed=3)
        T2 = max(lens2)
        feats2 = np.zeros((b2, T2, 120 * 11), np.float32)
        for u, win in enumerate(windows2):
            feats2[u, :win.shape[0]] = win
        feats2 = jax.device_put(jnp.asarray(feats2))
        lens2d = jax.device_put(jnp.asarray(lens2, dtype=jnp.int32))
        jax.block_until_ready(feats2)
        t0 = time.perf_counter()
        r2 = eng2.decode_features(feats2, lens2d)
        lv_compile = time.perf_counter() - t0
        # second decode exhausts the engine's device-A* spot-check
        # calibration (pseudo-set configs host-verify their first two
        # batches); the third measures steady state
        eng2.decode_features(feats2, lens2d)
        t0 = time.perf_counter()
        r2 = eng2.decode_features(feats2, lens2d)
        lv_wall = time.perf_counter() - t0
        lv_audio = sum(lens2) / 100.0
        lv_ok = sum(
            1 for u in range(b2)
            if r2[u].valid and [t for t in r2[u].texts if t]
            == [w for w in truths2[u] if w not in ("<s>", "</s>")])
        lv = {
            "vocab": 20000,
            "nodes": eng2.net.n_nodes,
            "senones": eng2.hmm.n_states,
            "e2e_xrt": round(lv_audio / lv_wall, 2),
            "exact_transcripts": f"{lv_ok}/{b2}",
            "compile_s": round(lv_compile, 1),
        }
    except Exception as e:      # keep the primary metric alive
        lv = {"error": str(e)[:200]}

    print(json.dumps({
        "metric": "decode_throughput_e2e",
        "value": round(e2e_xrt, 2),
        "unit": "audio_seconds_per_second (xRT, 1 chip, end-to-end)",
        "vs_baseline": round(e2e_xrt / REF_XRT, 2),
        "detail": {
            "batch": batch,
            "pass1_only_xrt": round(p1_xrt, 2),
            "pass1_wall_s_per_batch": round(p1_wall, 4),
            "e2e_wall_s_per_batch": round(e2e_wall, 4),
            "e2e_audio_s": round(audio_e2e, 1),
            "exact_transcripts": f"{correct}/{batch}",
            "compile_s": round(compile_s + e2e_compile_s, 1),
            "ref_xrt_baseline": REF_XRT,
            "lvcsr_20k": lv,
            "backend": jax.default_backend(),
        },
    }))


def _supervise():
    """Run the measurement in a CHILD process and retry once on
    failure: a faulted TPU run can poison the device for the rest of
    the process (CLAUDE.md), and round 4 lost its entire committed
    perf record to a single startup FAILED_PRECONDITION that a fresh
    process immediately survived.  The parent only parses the child's
    final JSON line and re-emits it, so the artifact stays parseable
    even when the first attempt crashes."""
    import subprocess
    last_err = ""
    for attempt in range(2):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"]
            + sys.argv[1:],
            capture_output=True, text=True, timeout=7200)
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                if isinstance(rec, dict) and "metric" in rec:
                    if attempt:
                        rec.setdefault("detail", {})["retried"] = True
                    print(json.dumps(rec))
                    return 0
            except ValueError:
                continue
        last_err = (proc.stderr or proc.stdout or "")[-2000:]
        print(f"bench attempt {attempt + 1} failed (rc={proc.returncode})"
              f"; {'retrying in a fresh process' if attempt == 0 else 'giving up'}",
              file=sys.stderr)
        if last_err:
            print(last_err, file=sys.stderr)
    print(json.dumps({
        "metric": "decode_throughput_e2e", "value": 0.0,
        "unit": "audio_seconds_per_second (xRT, 1 chip, end-to-end)",
        "vs_baseline": 0.0,
        "detail": {"error": last_err[-500:]}}))
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.argv.remove("--worker")
        main()
    else:
        sys.exit(_supervise())
