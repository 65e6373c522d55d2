"""Inter-word short pause and transparent-word tests."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text

from fixtures import make_arpa_text, make_hmmdefs_text, \
    sample_states_and_frames


@pytest.fixture(scope="module")
def models():
    # include a 1-state 'sp' short pause model
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil", "sp"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in [
        "<s>\t[]\tsil",
        "</s>\t[]\tsil",
        "AB\t[ab]\ta b",
        "BA\t[ba]\tb a",
        "UH\t{uh}\tc",          # transparent filler
    ]:
        parse_dict_line(line, voca)
    # add the filler to the LM as a unigram-only word (bigrams back off)
    lm_text = make_arpa_text().replace(
        "ngram 1=6", "ngram 1=7").replace(
        "\n\\2-grams:", "-1.5\tUH\t-0.3\n\n\\2-grams:")
    lm = parse_arpa(io.StringIO(lm_text))
    return hmm, voca, lm


def gen(hmm, voca, words, seed=0):
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(seed)
    pids = [hmm.phone_index[p] for w in words
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    return frames


def test_transparent_flag_parsed(models):
    hmm, voca, lm = models
    assert voca.transparent[voca.names.index("UH")]
    assert not voca.transparent[voca.names.index("AB")]


def test_iwsp_network_larger_and_decodes(models):
    hmm, voca, lm = models
    e_plain = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0))
    e_iwsp = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0),
                    iwsp=True)
    # sp states appended per word
    assert e_iwsp.net.n_nodes > e_plain.net.n_nodes
    frames = gen(hmm, voca, ["<s>", "AB", "BA", "</s>"], seed=1)
    r = e_iwsp.decode_features(jnp.asarray(frames[None]),
                               jnp.asarray([frames.shape[0]]))[0]
    assert r.valid
    assert r.words == ["<s>", "AB", "BA", "</s>"]


def test_iwsp_absorbs_pause(models):
    """Audio with an inter-word sp segment decodes correctly only when
    iwsp is enabled (without it, sp frames must be forced into word
    models)."""
    hmm, voca, lm = models
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(3)
    seqs = [["<s>"], ["AB"], ["sp-marker"], ["BA"], ["</s>"]]
    frames_parts = []
    for part in [["<s>"], ["AB"]]:
        pids = [hmm.phone_index[p] for w in part
                for p in voca.phones[name2id[w]]]
        f, _ = sample_states_and_frames(hmm, pids, rng)
        frames_parts.append(f)
    # 12 frames of 'sp' acoustics between words
    spid = hmm.phone_index["sp"]
    f, _ = sample_states_and_frames(hmm, [spid] * 4, rng)
    frames_parts.append(f)
    for part in [["BA"], ["</s>"]]:
        pids = [hmm.phone_index[p] for w in part
                for p in voca.phones[name2id[w]]]
        f, _ = sample_states_and_frames(hmm, pids, rng)
        frames_parts.append(f)
    frames = np.concatenate(frames_parts)

    e_iwsp = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0),
                    iwsp=True)
    r = e_iwsp.decode_features(jnp.asarray(frames[None]),
                               jnp.asarray([frames.shape[0]]))[0]
    assert r.words == ["<s>", "AB", "BA", "</s>"], r.words


def test_transparent_context_passthrough(models):
    """After a transparent filler, the LM context must be the word
    before the filler: decode '<s> AB UH BA </s>' — BA's bigram context
    should be AB, not UH (UH is not even in the LM)."""
    hmm, voca, lm = models
    frames = gen(hmm, voca, ["<s>", "AB", "UH", "BA", "</s>"], seed=4)
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, enable_pass2=False,
                                     transparent_penalty=-1.0))
    r = eng.decode_features(jnp.asarray(frames[None]),
                            jnp.asarray([frames.shape[0]]))[0]
    assert r.valid
    assert r.words == ["<s>", "AB", "UH", "BA", "</s>"], r.words
