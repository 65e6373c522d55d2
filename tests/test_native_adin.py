"""Native C++ adin runtime tests (compiled on the fly with g++)."""

import numpy as np
import pytest

from julius_tpu.adin.native_wrapper import (NativeDecimator,
                                            NativeSpeechDetector,
                                            native_available)
from julius_tpu.frontend.stream import SpeechDetector, VADConfig

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ unavailable")


def _tone_stream():
    t = np.arange(16000)
    tone = (8000 * np.sin(2 * np.pi * 300 * t / 16000)).astype(np.float32)
    quiet = np.zeros(8000, dtype=np.float32)
    return [quiet, tone[:8000], tone[8000:], quiet, quiet]


def test_native_matches_python_segmenter():
    cfg = VADConfig(level=1000, zc_thres=30, head_margin_ms=50,
                    tail_margin_ms=100, sample_rate=16000)
    pyd = SpeechDetector(cfg)
    nat = NativeSpeechDetector(cfg)
    py_ev, nat_ev = [], []
    for chunk in _tone_stream():
        py_ev.extend(pyd.feed(chunk))
        nat_ev.extend(nat.feed(chunk))
    py_kinds = [e["type"] for e in py_ev if e["type"] != "samples"]
    nat_kinds = [e["type"] for e in nat_ev if e["type"] != "samples"]
    assert py_kinds == nat_kinds
    py_n = sum(len(e["data"]) for e in py_ev if e["type"] == "samples")
    nat_n = sum(len(e["data"]) for e in nat_ev if e["type"] == "samples")
    assert abs(py_n - nat_n) <= 2


def test_native_segmenter_much_faster():
    import time
    cfg = VADConfig(sample_rate=16000)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(160000) * 300).astype(np.float32)
    nat = NativeSpeechDetector(cfg)
    t0 = time.perf_counter()
    nat.feed(audio)
    nat_dt = time.perf_counter() - t0
    # 10 s of audio should segment in well under real time
    assert nat_dt < 0.5, f"native segmenter too slow: {nat_dt:.3f}s"


def test_decimator_48_to_16():
    dec = NativeDecimator(factor=3)
    sr_in = 48000
    t = np.arange(sr_in)
    # a 1 kHz tone survives; a 20 kHz tone (above the 8 kHz target
    # Nyquist) is attenuated
    tone1k = np.sin(2 * np.pi * 1000 * t / sr_in).astype(np.float32)
    out = dec.feed(tone1k)
    assert abs(len(out) - sr_in // 3) <= 2
    # measure amplitude in steady state
    mid = out[2000:14000]
    assert 0.9 < np.max(np.abs(mid)) < 1.1

    dec2 = NativeDecimator(factor=3)
    tone20k = np.sin(2 * np.pi * 20000 * t / sr_in).astype(np.float32)
    out2 = dec2.feed(tone20k)
    assert np.max(np.abs(out2[2000:14000])) < 0.05
