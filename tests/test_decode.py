"""End-to-end pass-1 decode tests on synthetic generative models.

Audio frames are sampled from the acoustic model itself so the expected
transcript is known by construction (SURVEY.md §4 test strategy)."""

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

import io


@pytest.fixture(scope="module")
def models():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    return hmm, voca, lm


def frames_for(hmm, voca, word_ids, seed=0):
    rng = np.random.default_rng(seed)
    phone_ids = []
    for w in word_ids:
        for p in voca.phones[w]:
            phone_ids.append(hmm.phone_index[p])
    frames, _ = sample_states_and_frames(hmm, phone_ids, rng)
    return frames


def decode_words(engine, hmm, voca, word_seq, seed=0):
    name2id = {n: i for i, n in enumerate(voca.names)}
    ids = [name2id[w] for w in word_seq]
    frames = frames_for(hmm, voca, ids, seed)
    T = frames.shape[0]
    feats = jnp.asarray(frames[None])
    res = engine.decode_features(feats, jnp.asarray([T]))
    return res[0]


def test_pass1_recovers_transcript(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, lm_penalty=0.0,
                                     trellis_topm=8))
    for seed, seq in [(0, ["<s>", "AB", "BA", "</s>"]),
                      (1, ["<s>", "ABC", "</s>"]),
                      (2, ["<s>", "CA", "AB", "</s>"])]:
        r = decode_words(eng, hmm, voca, seq, seed=seed)
        assert r.valid
        assert r.words == seq, f"seed={seed}: got {r.words} want {seq}"


def test_pass1_batched_matches_single(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, trellis_topm=8))
    name2id = {n: i for i, n in enumerate(voca.names)}
    seqs = [["<s>", "AB", "</s>"], ["<s>", "BA", "CA", "</s>"]]
    frame_sets = [
        frames_for(hmm, voca, [name2id[w] for w in s], seed=10 + i)
        for i, s in enumerate(seqs)
    ]
    T = max(f.shape[0] for f in frame_sets)
    batch = np.zeros((2, T, frame_sets[0].shape[1]), np.float32)
    lens = np.zeros(2, np.int32)
    for i, f in enumerate(frame_sets):
        batch[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
    res = eng.decode_features(jnp.asarray(batch), jnp.asarray(lens))
    for i, s in enumerate(seqs):
        assert res[i].words == s
    # each alone must agree with the batch (padding must not leak)
    for i, s in enumerate(seqs):
        single = eng.decode_features(
            jnp.asarray(frame_sets[i][None]), jnp.asarray([lens[i]]))
        assert single[0].words == res[i].words
        assert abs(single[0].score - res[i].score) < 1e-3


def test_pass1_segments_cover_utterance(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, enable_pass2=False))
    r = decode_words(eng, hmm, voca, ["<s>", "AB", "BA", "</s>"], seed=3)
    assert r.valid and r.from_pass == 1
    segs = r.segments
    assert segs[0]["begin"] == 0
    for a, b in zip(segs, segs[1:]):
        assert b["begin"] == a["end"] + 1
    assert all(s["end"] >= s["begin"] for s in segs)


def test_beam_envelope_still_decodes(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, beam_width=200))
    r = decode_words(eng, hmm, voca, ["<s>", "ABC", "</s>"], seed=4)
    assert r.valid
    assert r.words == ["<s>", "ABC", "</s>"]
