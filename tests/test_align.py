"""Forced alignment tests."""

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
def setup():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    eng = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0))
    return hmm, voca, eng


def test_alignment_segments(setup):
    hmm, voca, eng = setup
    name2id = {n: i for i, n in enumerate(voca.names)}
    truth = ["<s>", "AB", "BA", "</s>"]
    ids = [name2id[w] for w in truth]
    rng = np.random.default_rng(0)
    # generate with known phone boundaries
    pids = [hmm.phone_index[p] for w in ids for p in voca.phones[w]]
    frames, states = sample_states_and_frames(hmm, pids, rng)
    T = frames.shape[0]

    al = eng.align(jnp.asarray(frames), T, ids)
    # word segments tile the utterance in order
    assert [w["word"] for w in al.words] == truth
    assert al.words[0]["begin"] == 0
    assert al.words[-1]["end"] == T - 1
    for a, b in zip(al.words, al.words[1:]):
        assert b["begin"] == a["end"] + 1
    # phone count = total phones in transcript
    n_phones = sum(len(voca.phones[w]) for w in ids)
    assert len(al.phones) == n_phones
    # state segments tile the utterance too, states within [2, 4]
    assert all(2 <= s["state"] <= 4 for s in al.states)
    assert al.states[0]["begin"] == 0
    assert al.states[-1]["end"] == T - 1
    assert np.isfinite(al.score)


def test_alignment_recovers_true_boundaries(setup):
    """Viterbi alignment on model-generated audio should land phone
    boundaries close to the generating boundaries."""
    hmm, voca, eng = setup
    name2id = {n: i for i, n in enumerate(voca.names)}
    ids = [name2id[w] for w in ["<s>", "ABC", "</s>"]]
    rng = np.random.default_rng(1)
    pids = [hmm.phone_index[p] for w in ids for p in voca.phones[w]]

    # sample with per-phone frame counts tracked
    frames_all = []
    true_bounds = []
    for pid in pids:
        f, _ = sample_states_and_frames(hmm, [pid], rng)
        frames_all.append(f)
        true_bounds.append(len(f))
    frames = np.concatenate(frames_all)
    T = frames.shape[0]
    al = eng.align(jnp.asarray(frames), T, ids)
    got_ends = [p["end"] for p in al.phones]
    want_ends = np.cumsum(true_bounds) - 1
    # boundaries within a small tolerance on easy synthetic data
    assert len(got_ends) == len(want_ends)
    for g, w in zip(got_ends[:-1], want_ends[:-1]):
        assert abs(g - w) <= 3, f"boundary {g} vs {w}"
