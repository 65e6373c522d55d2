"""GMM verification / GMM-VAD driven entirely from jconf options
(reference gmm.c:429-734 via -gmm/-gmmnum/-gmmreject/-gmmmargin;
m_options.c:1218-1250) — no hand-wiring of engine attributes."""

import io

import numpy as np
import pytest

from julius_tpu.fusion import create_engines
from julius_tpu.jconf import parse_jconf
from julius_tpu.io.htk_hmm import parse_hmmdefs_text

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)

DIM = 4


def _gmm_defs() -> str:
    """Two 1-state 'GMM' models: voice (mean 0) and noise (mean +8)."""
    out = io.StringIO()
    out.write(f"~o <VecSize> {DIM} <USER> <DIAGC> <NULLD>\n")
    for name, mean in (("voice", 0.0), ("noise", 8.0)):
        out.write(f'~h "{name}"\n<BeginHMM>\n<NumStates> 3\n<State> 2\n')
        out.write(f"<Mean> {DIM}\n " +
                  " ".join(f"{mean:.1f}" for _ in range(DIM)) + "\n")
        out.write(f"<Variance> {DIM}\n " +
                  " ".join("1.0" for _ in range(DIM)) + "\n")
        out.write("<TransP> 3\n 0.0 1.0 0.0\n 0.0 0.5 0.5\n 0.0 0.0 0.0\n")
        out.write("<EndHMM>\n")
    return out.getvalue()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("gmmwire")
    (d / "hmmdefs").write_text(make_hmmdefs_text(dim=DIM))
    (d / "words.dict").write_text(make_dict_text())
    (d / "lm.arpa").write_text(make_arpa_text())
    (d / "gmmdefs").write_text(_gmm_defs())
    return d


def _engine(setup, extra=()):
    cfg = parse_jconf([
        "-h", str(setup / "hmmdefs"), "-v", str(setup / "words.dict"),
        "-nlr", str(setup / "lm.arpa"),
        "-gmm", str(setup / "gmmdefs"), *extra,
        "-lmp", "2.0", "-0.0",
    ])
    return create_engines(cfg)[0], cfg


def test_jconf_gmm_rejects_noise(setup):
    import jax.numpy as jnp
    eng, _ = _engine(setup, ("-gmmreject", "noise"))
    assert eng.gmm_frontend is not None
    rng = np.random.default_rng(0)
    # a "noise" utterance: frames near the noise model's mean
    noise = (8.0 + rng.standard_normal((60, DIM))).astype(np.float32)
    # a "voice" utterance drawn from the AM's generative model
    hmm = parse_hmmdefs_text(make_hmmdefs_text(dim=DIM))
    pids = [hmm.phone_index[p] for p in ("sil", "a", "b", "sil")]
    voice, _ = sample_states_and_frames(hmm, pids, rng)
    T = max(60, voice.shape[0])
    batch = np.zeros((2, T, DIM), np.float32)
    batch[0, :60] = noise
    batch[1, :voice.shape[0]] = voice
    res = eng.decode_features(jnp.asarray(batch),
                              jnp.asarray([60, voice.shape[0]]))
    assert not res[0].valid and "GMM rejected" in res[0].reject_reason
    assert res[1].valid


def test_jconf_gmm_vad_segments(setup):
    """-gmmmargin/-gmmup/-gmmdown + noise names gate a feature stream."""
    from julius_tpu.streaming import StreamSession
    eng, cfg = _engine(setup, ("-gmmnoise", "noise",
                               "-gmmup", "2.0", "-gmmdown", "-2.0",
                               "-gmmmargin", "5"))
    assert cfg.gmm_vad
    sess = StreamSession(eng, use_vad=False, block_frames=8,
                         gmm_vad=True, gmm_margin=cfg.gmm_margin)
    rng = np.random.default_rng(1)
    hmm = parse_hmmdefs_text(make_hmmdefs_text(dim=DIM))
    pids = [hmm.phone_index[p]
            for w in ("sil", "a", "b", "sil") for p in (w,)]
    voice, _ = sample_states_and_frames(hmm, pids, rng)
    noise = (8.0 + rng.standard_normal((40, DIM))).astype(np.float32)
    stream = np.concatenate([noise, voice, noise]).astype(np.float32)
    results = []
    for ofs in range(0, stream.shape[0], 8):
        results.extend(sess._feed_gmm_vad(stream[ofs:ofs + 8]))
    results.extend(sess.close())
    assert results, "GMM-VAD never triggered a segment"
    assert any(r.valid and r.words for r in results)


def test_powerthres_rejects_quiet(setup):
    """-powerthres rejects a low-energy utterance (POWER_REJECT,
    reference pass1.c:321)."""
    import jax.numpy as jnp
    cfg = parse_jconf([
        "-h", str(setup / "hmmdefs"), "-v", str(setup / "words.dict"),
        "-nlr", str(setup / "lm.arpa"), "-powerthres", "100.0",
    ])
    eng = create_engines(cfg)[0]
    assert eng.power_thres == 100.0
    rng = np.random.default_rng(2)
    quiet = rng.standard_normal((50, DIM)).astype(np.float32)
    res = eng.decode_features(jnp.asarray(quiet[None]), jnp.asarray([50]))
    assert not res[0].valid and res[0].reject_reason == "low power"
