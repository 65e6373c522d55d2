"""Pass-2 stack decoding / N-best rescoring tests."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
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


def run(engine, hmm, voca, seq, seed=0):
    name2id = {n: i for i, n in enumerate(voca.names)}
    ids = [name2id[w] for w in seq]
    rng = np.random.default_rng(seed)
    pids = [hmm.phone_index[p] for w in ids for p in voca.phones[w]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    return engine.decode_features(
        jnp.asarray(frames[None]), jnp.asarray([frames.shape[0]]))[0]


def test_pass2_recovers_transcript(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, lm_weight2=2.0,
                                     enable_pass2=True, nbest=3))
    for seed, seq in [(0, ["<s>", "AB", "BA", "</s>"]),
                      (1, ["<s>", "ABC", "</s>"])]:
        r = run(eng, hmm, voca, seq, seed)
        assert r.valid and r.from_pass == 2
        assert r.words == seq, f"got {r.words}"
        # N-best list: best first, decreasing scores, best == result
        scores = [h.score for h in r.nbest]
        assert scores == sorted(scores, reverse=True)
        assert r.nbest[0].words == r.words
        # AM + LM decompose the total
        assert abs(r.am_score + r.lm_score - r.score) < 1e-3


def test_pass2_nbest_are_distinct(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, enable_pass2=True,
                                     nbest=5))
    r = run(eng, hmm, voca, ["<s>", "AB", "BA", "</s>"], seed=2)
    seqs = [tuple(h.words) for h in r.nbest]
    assert len(seqs) == len(set(seqs)), f"duplicate hypotheses: {seqs}"
    assert len(seqs) >= 2


def test_confidence_scores(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, enable_pass2=True,
                                     nbest=5, compute_confidence=True))
    r = run(eng, hmm, voca, ["<s>", "ABC", "</s>"], seed=3)
    assert r.cm is not None and len(r.cm) == len(r.words)
    assert all(0.0 <= c <= 1.0 for c in r.cm)
    # an unambiguous decode should have high confidence overall
    assert r.cm[0] > 0.5


def test_pass2_matches_pass1_when_lm_same(models):
    """With identical pass-1/2 LM weights and a 2-gram, the pass-2 best
    must score at least as high as the pass-1 Viterbi path."""
    hmm, voca, lm = models
    sc = SearchConfig(lm_weight=2.0, lm_weight2=2.0, lm_penalty=0.0,
                      lm_penalty2=0.0, enable_pass2=True)
    eng = Engine(hmm, voca, lm, search=sc)
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(4)
    ids = [name2id[w] for w in ["<s>", "CA", "AB", "</s>"]]
    pids = [hmm.phone_index[p] for w in ids for p in voca.phones[w]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    feats = jnp.asarray(frames[None])
    lens = jnp.asarray([frames.shape[0]])

    r2 = eng.decode_features(feats, lens)[0]
    sc1 = SearchConfig(lm_weight=2.0, lm_penalty=0.0, enable_pass2=False)
    eng1 = Engine(hmm, voca, lm, search=sc1)
    r1 = eng1.decode_features(feats, lens)[0]
    assert r2.words == r1.words
    assert r2.score >= r1.score - 1e-2
