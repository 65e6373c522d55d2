"""DFA grammar mode and isolated-word mode decode tests."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.dfa import parse_dfa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text

from fixtures import make_hmmdefs_text, sample_states_and_frames

# grammar (forward): sil (AB|BA) (ABC|CA) sil
# the .dfa is over REVERSED sentences (mkdfa convention):
#   sil (ABC|CA) (AB|BA) sil
# categories: 0 = sil, 1 = {AB, BA}, 2 = {ABC, CA}
DFA_TEXT = """\
0 0 1 0x2
1 2 2 0
2 1 3 0
3 0 4 0
4 -1 -1 1
DFAEND
"""

DICT_TEXT = """\
0\t[sil]\tsil
1\t[AB]\ta b
1\t[BA]\tb a
2\t[ABC]\ta b c
2\t[CA]\tc a
"""


@pytest.fixture(scope="module")
def models():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    dfa = parse_dfa(io.StringIO(DFA_TEXT))
    voca = Vocabulary()
    for line in DICT_TEXT.splitlines():
        parse_dict_line(line, voca)
    word_cat = np.asarray([int(n) for n in voca.names], dtype=np.int32)
    return hmm, dfa, voca, word_cat


def test_dfa_accepts_forward(models):
    _, dfa, _, _ = models
    assert dfa.accepts_forward([0, 1, 2, 0])        # sil AB ABC sil
    assert not dfa.accepts_forward([0, 2, 1, 0])    # wrong order
    assert not dfa.accepts_forward([0, 1, 2])       # missing tail sil
    assert not dfa.accepts_forward([1, 2, 0])       # missing head sil


def test_cpair_orientation(models):
    _, dfa, _, _ = models
    cp, cp_begin, cp_end = dfa.category_pair_matrix()
    # forward order: sil then {AB,BA}(cat1): allowed
    assert cp[0, 1] and cp[1, 2] and cp[2, 0]
    assert not cp[0, 2] and not cp[2, 1]
    assert cp_begin[0] and not cp_begin[1]
    assert cp_end[0] and not cp_end[2]


def frames_for(hmm, voca, word_ids, seed):
    rng = np.random.default_rng(seed)
    pids = [hmm.phone_index[p] for w in word_ids for p in voca.phones[w]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    return frames


def test_grammar_decode(models):
    hmm, dfa, voca, word_cat = models
    eng = Engine(hmm, voca, dfa=dfa, word_cat=word_cat,
                 search=SearchConfig(trellis_topm=8))
    out2id = {o: i for i, o in enumerate(voca.outputs)}
    for seed, texts in [(0, ["sil", "AB", "ABC", "sil"]),
                        (1, ["sil", "BA", "CA", "sil"])]:
        ids = [out2id[t] for t in texts]
        frames = frames_for(hmm, voca, ids, seed)
        r = eng.decode_features(jnp.asarray(frames[None]),
                                jnp.asarray([frames.shape[0]]))[0]
        assert r.valid
        assert r.texts == texts, f"seed={seed}: got {r.texts}"
        # grammar-mode result must be accepted by the DFA
        cats = [int(word_cat[w]) for w in r.word_ids]
        assert dfa.accepts_forward(cats)


def test_grammar_rejects_unparseable_order(models):
    """Audio generated in an order the grammar forbids (sil ABC AB sil)
    must still decode to a grammar-ACCEPTED sequence."""
    hmm, dfa, voca, word_cat = models
    eng = Engine(hmm, voca, dfa=dfa, word_cat=word_cat,
                 search=SearchConfig(trellis_topm=8))
    out2id = {o: i for i, o in enumerate(voca.outputs)}
    ids = [out2id[t] for t in ["sil", "ABC", "AB", "sil"]]
    frames = frames_for(hmm, voca, ids, 2)
    r = eng.decode_features(jnp.asarray(frames[None]),
                            jnp.asarray([frames.shape[0]]))[0]
    if r.valid and r.from_pass == 2:
        cats = [int(word_cat[w]) for w in r.word_ids]
        assert dfa.accepts_forward(cats)


def test_isolated_word_mode(models):
    hmm, _, _, _ = models
    voca = Vocabulary()
    voca.add("APPLE", ["a", "b", "c"])
    voca.add("BANANA", ["b", "a"])
    voca.add("CHERRY", ["c", "a", "b"])
    eng = Engine(hmm, voca, lmtype="word",
                 search=SearchConfig(trellis_topm=4, enable_pass2=False))
    for seed, word in [(0, "APPLE"), (1, "BANANA"), (2, "CHERRY")]:
        wid = voca.names.index(word)
        frames = frames_for(hmm, voca, [wid], seed)
        r = eng.decode_features(jnp.asarray(frames[None]),
                                jnp.asarray([frames.shape[0]]))[0]
        assert r.valid
        assert r.words == [word], f"got {r.words} want {word}"
