"""Callback registry, user LM hook, and -progout interim results."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from julius_tpu.config import FrontendConfig, SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.utils.callback import CallbackRegistry

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)


@pytest.fixture(scope="module")
def models():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    return hmm, voca, lm


def frames_for(hmm, voca, words, seed=0):
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(seed)
    pids = [hmm.phone_index[p] for w in words
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    return frames


def test_registry_add_delete_exec():
    reg = CallbackRegistry()
    got = []
    i1 = reg.add("result", lambda r: got.append(("a", r)))
    reg.add("result", lambda r: got.append(("b", r)))
    reg.exec("result", 1)
    assert got == [("a", 1), ("b", 1)]
    assert reg.delete(i1)
    reg.exec("result", 2)
    assert got[-1] == ("b", 2)
    assert not reg.delete(999)
    assert reg.exists("result") and not reg.exists("poll")


def test_engine_result_callback(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, trellis_topm=8))
    seen = []
    eng.callbacks.add("result", seen.append)
    frames = frames_for(hmm, voca, ["<s>", "AB", "</s>"])
    res = eng.decode_features(jnp.asarray(frames[None]),
                              jnp.asarray([frames.shape[0]]))
    assert len(seen) == 1 and seen[0] is res[0]
    assert seen[0].words == ["<s>", "AB", "</s>"]


def test_user_lm_changes_pass2_choice(models):
    """A user LM that strongly dislikes one word must change the pass-2
    N-best ordering (reference LM_NGRAM_USER, j_regist_user_lm_func)."""
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, lm_weight2=2.0,
                                     nbest=3, output_n=3, trellis_topm=16))
    frames = frames_for(hmm, voca, ["<s>", "AB", "</s>"], seed=2)
    base = eng.decode_features(jnp.asarray(frames[None]),
                               jnp.asarray([frames.shape[0]]))[0]
    assert base.words == ["<s>", "AB", "</s>"]
    name2id = {n: i for i, n in enumerate(voca.names)}
    bad = name2id["AB"]

    def user_lm(ctx, w):
        return -50.0 if w == bad else -0.3

    eng.register_user_lm(user_lm, order=2)
    res = eng.decode_features(jnp.asarray(frames[None]),
                              jnp.asarray([frames.shape[0]]))[0]
    # the acoustics still say AB, but the user LM crushes it: the
    # winning hypothesis must now avoid the banned word
    assert res.from_pass == 2
    assert "AB" not in res.words


def test_streaming_progout_and_events(models):
    """StreamSession fires speech events and interim pass-1 results."""
    from julius_tpu.streaming import StreamSession

    hmm, voca, lm = models
    fe_cfg = FrontendConfig(mfcc_dim=3, use_energy=True, use_delta=False,
                            cmn=False)
    assert fe_cfg.veclen == 4
    eng = Engine(hmm, voca, lm, frontend=fe_cfg,
                 search=SearchConfig(lm_weight=2.0, trellis_topm=8))
    events = []
    eng.callbacks.add("event_speech_start", lambda: events.append("start"))
    eng.callbacks.add("event_speech_stop", lambda: events.append("stop"))
    interim = []
    eng.callbacks.add("result_pass1_interim", interim.append)
    finals = []
    eng.callbacks.add("result", finals.append)

    sess = StreamSession(eng, use_vad=False, block_frames=8,
                         progout=True, prog_frames=10)
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000) * 2000.0).astype(np.float32)
    got = []
    for ofs in range(0, len(wave), 1600):
        got.extend(sess.feed(wave[ofs: ofs + 1600]))
    got.extend(sess.close())
    assert "stop" in events
    assert interim, "progout should produce interim pass-1 results"
    assert all(r.valid for r in interim)
    assert len(finals) == len(got) and got
