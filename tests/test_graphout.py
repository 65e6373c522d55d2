"""Lattice / confusion network / MBR tests."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.search import graphout as go
from julius_tpu.search.pass2 import NBestResult

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)


@pytest.fixture(scope="module")
def decoded():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, nbest=5,
                                     graph_out=True, confnet_out=True))
    name2id = {n: i for i, n in enumerate(voca.names)}
    truth = ["<s>", "AB", "BA", "</s>"]
    rng = np.random.default_rng(0)
    pids = [hmm.phone_index[p] for w in truth
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    r = eng.decode_features(jnp.asarray(frames[None]),
                            jnp.asarray([frames.shape[0]]))[0]
    return eng, r, truth, frames.shape[0]


def test_word_graph(decoded):
    eng, r, truth, T = decoded
    g = r.graph
    assert g is not None and len(g) > 0
    # links are consistent and frame-contiguous
    for w in g.words:
        for j in w.right:
            assert g.words[j].begin == w.end + 1
            assert w.id in g.words[j].left
        assert 0 <= w.posterior <= 1.0 + 1e-6
    # the 1-best path words appear in the graph
    names = [eng.voca.names[w.word] for w in g.words]
    for t in truth:
        assert t in names
    # lattice text dump parses back line-per-word
    txt = go.graph_to_text(g, eng.voca.names)
    assert len(txt.strip().splitlines()) == len(g)
    assert "left=" in txt and "AM=" in txt


def test_best_path_posteriors_high(decoded):
    eng, r, truth, T = decoded
    g = r.graph
    # words on the (unambiguous) best path should be high-posterior
    best = {}
    for w in g.words:
        best[eng.voca.names[w.word]] = max(
            best.get(eng.voca.names[w.word], 0.0), w.posterior)
    # <s>/</s> share identical sil acoustics, so mass can split ~50/50
    # between them at the boundaries; 0.4 keeps the check meaningful
    for t in truth:
        assert best[t] > 0.4, f"{t}: posterior {best[t]}"


def test_confusion_network(decoded):
    eng, r, truth, T = decoded
    cn = r.confnet
    assert cn is not None and len(cn) >= len(truth)
    # consensus = best word of each high-mass slot; <s>/</s> share
    # identical sil acoustics so either may win the tail slot
    consensus = [eng.voca.names[c.best()[0]] for c in cn
                 if sum(c.probs) > 0.5]
    assert len(consensus) == len(truth)
    assert consensus[:3] == truth[:3]
    assert consensus[3] in ("<s>", "</s>")
    for c in cn:
        assert sum(c.probs) <= 1.0 + 1e-5


def test_mbr_rerank_prefers_centroid():
    mk = lambda ids, s: NBestResult(word_ids=ids, score=s, am_score=s,
                                    lm_score=0.0, bounds=[])
    # three similar hypotheses + one outlier with slightly better score
    res = [mk([1, 2, 3], -10.0), mk([1, 2, 3, 4], -10.5),
           mk([1, 2, 5], -10.6), mk([9, 9, 9, 9, 9], -9.9)]
    out = go.mbr_rerank(res, score_scale=1.0)
    assert out[0].word_ids == [1, 2, 3]   # centroid wins over outlier


def test_edit_distance():
    assert go.edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert go.edit_distance([1, 2, 3], [1, 3]) == 1
    assert go.edit_distance([], [1, 2]) == 2
    w = np.asarray([1.0, 2.0, 1.0, 1.0])
    assert go.edit_distance([1], [2], weights=w) == 2.0  # sub cost of w[1]
