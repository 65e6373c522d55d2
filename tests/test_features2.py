"""Tests for factoring-2 mode, GMM front-end, and CMN file round trip."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.frontend.gmm_frontend import GMMFrontend
from julius_tpu.frontend.stream import load_cmn_file, save_cmn_file
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text

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


def run(eng, hmm, voca, seq, seed=0):
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(seed)
    pids = [hmm.phone_index[p] for w in seq
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    return eng.decode_features(jnp.asarray(frames[None]),
                               jnp.asarray([frames.shape[0]]))[0], frames


def test_factoring2_decodes_and_matches(models):
    hmm, voca, lm = models
    sc1 = SearchConfig(lm_weight=2.0, factoring=1)
    sc2 = SearchConfig(lm_weight=2.0, factoring=2)
    e1 = Engine(hmm, voca, lm, search=sc1)
    e2 = Engine(hmm, voca, lm, search=sc2)
    for seed, seq in [(0, ["<s>", "AB", "BA", "</s>"]),
                      (1, ["<s>", "ABC", "</s>"])]:
        r1, _ = run(e1, hmm, voca, seq, seed)
        r2, _ = run(e2, hmm, voca, seq, seed)
        assert r2.words == seq
        assert r1.words == r2.words
        # both modes apply the exact 2-gram to the winning path
        assert abs(r1.score - r2.score) < 0.5


def test_gmm_rejection(models):
    hmm, voca, lm = models
    # GMM set: "voice" matches phone 'a' stats, "noise" is far away
    gmm_hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("voice", "noise"), dim=4, n_states=1, n_mix=1, seed=99))
    # make 'voice' model match phone-a-ish frames, noise far off
    gmm_hmm.means[0][:] = hmm.means[hmm.state_mix[0, 0]]
    gmm_hmm.means[1][:] = 100.0
    gf = GMMFrontend(gmm_hmm, reject_names=["noise"])

    eng = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0))
    eng.gmm_frontend = gf
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(2)
    pids = [hmm.phone_index[p] for w in ["<s>", "AB", "</s>"]
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    g = gf.verify(frames)
    assert g.best_name == "voice" and g.accepted
    # frames near the noise mean get rejected
    noise = np.full((30, 4), 100.0, dtype=np.float32)
    g2 = gf.verify(noise)
    assert g2.best_name == "noise" and not g2.accepted


def test_short_input_rejection(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0))
    eng.reject_short_frames = 1000
    _, frames = run(eng, hmm, voca, ["<s>", "AB", "</s>"], 3)
    r = eng.decode_features(jnp.asarray(frames[None]),
                            jnp.asarray([frames.shape[0]]))[0]
    assert not r.valid and "short" in r.reject_reason


def test_cmn_file_roundtrip(tmp_path):
    mean = np.linspace(-1, 1, 26)
    var = np.linspace(0.5, 2.0, 26)
    p = str(tmp_path / "cmn")
    save_cmn_file(p, mean, var)
    m2, v2 = load_cmn_file(p)
    np.testing.assert_allclose(m2, mean, rtol=1e-5)
    np.testing.assert_allclose(v2, var, rtol=1e-5)
    # mean-only
    save_cmn_file(p, mean)
    m3, v3 = load_cmn_file(p)
    np.testing.assert_allclose(m3, mean, rtol=1e-5)
    assert v3 is None
