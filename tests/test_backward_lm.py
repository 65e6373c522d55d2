"""Backward (RL) N-gram pair decoding tests (-nlr/-nrl semantics)."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import forward_view, parse_arpa, write_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)


def make_backward_arpa(fwd_text: str) -> str:
    """Reverse a 2-gram ARPA: same unigrams, tuples flipped (as if
    trained on reversed sentences; probabilities kept — adequate for
    decode-machinery tests)."""
    lm = parse_arpa(io.StringIO(fwd_text))
    rev = parse_arpa(io.StringIO(fwd_text))
    rev.ngrams[1] = {(b, a): p for (a, b), p in lm.ngrams[1].items()}
    out = io.StringIO()
    out.write("\n\\data\\\n")
    out.write(f"ngram 1={len(rev.ngrams[0])}\n")
    out.write(f"ngram 2={len(rev.ngrams[1])}\n")
    out.write("\n\\1-grams:\n")
    for (w,), (p, b) in rev.ngrams[0].items():
        out.write(f"{p:.4f}\t{rev.words[w]}\t{b:.2f}\n")
    out.write("\n\\2-grams:\n")
    for (a, b), (p, _) in rev.ngrams[1].items():
        out.write(f"{p:.4f}\t{rev.words[a]} {rev.words[b]}\n")
    out.write("\n\\end\\\n")
    return out.getvalue()


@pytest.fixture(scope="module")
def models():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    fwd_text = make_arpa_text()
    fwd = parse_arpa(io.StringIO(fwd_text))
    bwd = parse_arpa(io.StringIO(make_backward_arpa(fwd_text)),
                     direction="RL")
    return hmm, voca, fwd, bwd


def test_rl_direction_swaps_bos_eos(models):
    _, _, fwd, bwd = models
    assert bwd.direction == "RL"
    # reference swaps BOS/EOS for RL models (ngram2.h:169)
    assert bwd.bos_id == fwd.eos_id and bwd.eos_id == fwd.bos_id


def test_forward_view_requires_pair(models):
    _, _, fwd, bwd = models
    with pytest.raises(ValueError):
        forward_view(bwd)           # no forward 2-gram available
    fv = forward_view(bwd, fwd)
    assert fv is fwd


def test_backward_pair_decodes(models):
    hmm, voca, fwd, bwd = models
    eng = Engine(hmm, voca, lm=bwd, lm_forward=fwd,
                 search=SearchConfig(lm_weight=2.0, lm_weight2=2.0,
                                     nbest=3))
    name2id = {n: i for i, n in enumerate(voca.names)}
    for seed, seq in [(0, ["<s>", "AB", "BA", "</s>"]),
                      (1, ["<s>", "ABC", "</s>"])]:
        rng = np.random.default_rng(seed)
        pids = [hmm.phone_index[p] for w in seq
                for p in voca.phones[name2id[w]]]
        frames, _ = sample_states_and_frames(hmm, pids, rng)
        r = eng.decode_features(jnp.asarray(frames[None]),
                                jnp.asarray([frames.shape[0]]))[0]
        assert r.valid and r.from_pass == 2
        assert r.words == seq, f"seed={seed}: {r.words}"
        # the N-best are forward-ordered sentences ending with </s>
        for h in r.nbest:
            assert h.words[0] == "<s>" and h.words[-1] == "</s>"


def test_bingram_pair_roundtrip(models, tmp_path):
    """An RL model written+read through bingram keeps working via its
    attached forward bigram (the mkbingram pair layout)."""
    hmm, voca, fwd, bwd = models
    # attach the pair the way io.bingram does
    bwd.forward_bigram = {(a, b): p
                          for (a, b), (p, _) in fwd.ngrams[1].items()}
    fv = forward_view(bwd)
    assert fv.direction == "LR"
    assert fv.ngrams[1]
    eng = Engine(hmm, voca, lm=bwd,
                 search=SearchConfig(lm_weight=2.0))
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(2)
    seq = ["<s>", "CA", "</s>"]
    pids = [hmm.phone_index[p] for w in seq
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    r = eng.decode_features(jnp.asarray(frames[None]),
                            jnp.asarray([frames.shape[0]]))[0]
    assert r.valid and r.words == seq
