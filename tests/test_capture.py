"""Native mic-capture layer (ALSA/Pulse/OSS via dlopen) + fake replay."""

import numpy as np
import pytest

from julius_tpu.adin.native_wrapper import (FakeCapture, NativeCapture,
                                            make_capture, native_available)
from julius_tpu.io.wav import write_wav


def _test_wav(tmp_path, sr=16000):
    rng = np.random.default_rng(0)
    quiet = rng.standard_normal(sr // 2) * 50
    loud = np.sin(2 * np.pi * 431 * np.arange(sr) / sr) * 12000 \
        + rng.standard_normal(sr) * 500
    audio = np.concatenate([quiet, loud, quiet]).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(str(p), audio, sr)
    return str(p), audio


@pytest.mark.skipif(not native_available(), reason="no compiler")
def test_capture_open_fails_gracefully():
    """No audio stack in this environment: cap_open must report why
    instead of crashing (reference drivers abort; we raise)."""
    for backend in ("alsa", "pulseaudio", "oss", "auto"):
        with pytest.raises(RuntimeError) as e:
            NativeCapture(backend)
        assert "capture" in str(e.value) or ":" in str(e.value)


def test_fake_capture_replays_file(tmp_path):
    p, audio = _test_wav(tmp_path)
    cap = make_capture(f"fake:{p}")
    chunks = []
    while True:
        c = cap.read(4000)
        if c is None:
            break
        chunks.append(c)
    got = np.concatenate(chunks)
    assert len(got) == len(audio)
    assert np.allclose(got, np.round(audio), atol=1.0)


def test_adintool_fake_mic(tmp_path):
    """adintool -in fake:file segments the replayed stream like the
    file path (reference adintool mic input + segmentation)."""
    from julius_tpu.tools.adintool import main

    p, _ = _test_wav(tmp_path)
    prefix = str(tmp_path / "seg")
    rc = main(["-in", f"fake:{p}", "-out", "file",
               "-filename-out", prefix])
    assert rc == 0
    import glob
    segs = glob.glob(prefix + "*")
    assert len(segs) >= 1
