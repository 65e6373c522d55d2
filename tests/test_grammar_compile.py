"""Grammar compiler (mkdfa equivalent) tests."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu import grammar as G
from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.dfa import parse_dfa
from julius_tpu.io.htk_hmm import parse_hmmdefs_text

from fixtures import make_hmmdefs_text, sample_states_and_frames

GRAMMAR = """\
S : NS_B CMD NS_E
CMD : VERB
CMD : VERB OBJ
OBJ : NOUN
OBJ : NOUN NOUN
"""

VOCA = """\
% NS_B
silb sil
% NS_E
sile sil
% VERB
go a b
stop b a
% NOUN
left a b c
right c a
"""


def test_compile_and_accept():
    dfa_rev, dfa_fwd, voca, word_cat, cats = G.compile_grammar(GRAMMAR, VOCA)
    c = {name: i for i, name in enumerate(cats)}
    ok = [c["NS_B"], c["VERB"], c["NS_E"]]
    ok2 = [c["NS_B"], c["VERB"], c["NOUN"], c["NOUN"], c["NS_E"]]
    bad = [c["NS_B"], c["NOUN"], c["NS_E"]]
    bad2 = [c["VERB"], c["NS_E"]]
    assert G.accept_check(dfa_fwd, ok)
    assert G.accept_check(dfa_fwd, ok2)
    assert not G.accept_check(dfa_fwd, bad)
    assert not G.accept_check(dfa_fwd, bad2)
    # the reversed DFA accepts reversed sentences (decoder convention)
    assert dfa_rev.accepts_forward(ok)
    assert dfa_rev.accepts_forward(ok2)
    assert not dfa_rev.accepts_forward(bad)


def test_tail_recursion():
    g = "S : NS_B LIST NS_E\nLIST : WORD\nLIST : WORD LIST\n"
    v = "% NS_B\nsilb sil\n% NS_E\nsile sil\n% WORD\nw a\n"
    dfa_rev, dfa_fwd, voca, word_cat, cats = G.compile_grammar(g, v)
    c = {name: i for i, name in enumerate(cats)}
    for k in (1, 2, 5):
        seq = [c["NS_B"]] + [c["WORD"]] * k + [c["NS_E"]]
        assert G.accept_check(dfa_fwd, seq), k
    assert not G.accept_check(dfa_fwd, [c["NS_B"], c["NS_E"]])


def test_center_recursion_rejected():
    g = "S : A\nA : WORD A WORD\nA : WORD\n"
    v = "% WORD\nw a\n"
    with pytest.raises(G.GrammarError):
        G.compile_grammar(g, v)


def test_dfa_file_roundtrip(tmp_path):
    dfa_rev, _, voca, word_cat, cats = G.compile_grammar(GRAMMAR, VOCA)
    p = str(tmp_path / "g.dfa")
    G.write_dfa(dfa_rev, p)
    dfa2 = parse_dfa(open(p))
    c = {name: i for i, name in enumerate(cats)}
    ok = [c["NS_B"], c["VERB"], c["NOUN"], c["NS_E"]]
    assert dfa2.accepts_forward(ok) == dfa_rev.accepts_forward(ok)
    assert dfa2.n_terms == dfa_rev.n_terms


def test_generate_sentences_all_accepted():
    _, dfa_fwd, _, _, cats = G.compile_grammar(GRAMMAR, VOCA)
    sents = G.generate_sentences(dfa_fwd, n=10, seed=1)
    assert sents
    for s in sents:
        assert G.accept_check(dfa_fwd, s)


def test_next_categories():
    _, dfa_fwd, _, _, cats = G.compile_grammar(GRAMMAR, VOCA)
    c = {name: i for i, name in enumerate(cats)}
    assert G.next_categories(dfa_fwd, []) == [c["NS_B"]]
    nxt = G.next_categories(dfa_fwd, [c["NS_B"], c["VERB"]])
    assert set(nxt) == {c["NS_E"], c["NOUN"]}


def test_mkdfa_files_decode(tmp_path):
    """Compile a grammar to files, load them through the standard
    loaders, and decode with the engine end-to-end."""
    (tmp_path / "g.grammar").write_text(GRAMMAR)
    (tmp_path / "g.voca").write_text(VOCA)
    G.mkdfa(str(tmp_path / "g"))
    assert (tmp_path / "g.dfa").exists()
    assert (tmp_path / "g.dfa.forward").exists()
    assert (tmp_path / "g.dict").exists()

    from julius_tpu.io.dfa import load_grammar
    dfa, voca, word_cat = load_grammar(str(tmp_path / "g"))
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    eng = Engine(hmm, voca, dfa=dfa, word_cat=word_cat,
                 search=SearchConfig(trellis_topm=8))
    out2id = {o: i for i, o in enumerate(voca.outputs)}
    truth = ["silb", "go", "left", "sile"]
    rng = np.random.default_rng(0)
    pids = [hmm.phone_index[p] for t in truth
            for p in voca.phones[out2id[t]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    r = eng.decode_features(jnp.asarray(frames[None]),
                            jnp.asarray([frames.shape[0]]))[0]
    assert r.valid
    assert r.texts == truth, r.texts


def test_determinize_and_minimize_preserve_language(tmp_path):
    """dfa_determinize / dfa_minimize keep acceptance over random
    sequences and minimize never grows the automaton."""
    import itertools
    import random

    dfa_rev, dfa_fwd, voca, word_cat, cats = G.compile_grammar(GRAMMAR, VOCA)
    # build a nondeterministic variant: duplicate a state by adding a
    # parallel arc path (simulates mkfa output before minimisation)
    nfa = G.determinize_dfa(dfa_fwd)   # determinize of DFA = same language
    mini = G.minimize_dfa(dfa_fwd)
    assert mini.n_states <= dfa_fwd.n_states
    ncat = len(cats)
    seqs = [list(s) for n in range(1, 5)
            for s in itertools.product(range(ncat), repeat=n)]
    random.Random(0).shuffle(seqs)
    for s in seqs[:300]:
        want = G.accept_check(dfa_fwd, s)
        assert G.accept_check(nfa, s) == want
        assert G.accept_check(mini, s) == want


def test_modeltools_dfa_cli(tmp_path, capsys):
    from julius_tpu.tools import modeltools as mt

    dfa_rev, dfa_fwd, voca, word_cat, cats = G.compile_grammar(GRAMMAR, VOCA)
    src = tmp_path / "g.dfa"
    G.write_dfa(dfa_fwd, str(src))
    dst = tmp_path / "g.min.dfa"
    rc = mt.main(["dfa-minimize", str(src), str(dst)])
    assert rc == 0 and dst.exists()
    from julius_tpu.io.dfa import load_dfa
    out = load_dfa(str(dst))
    assert out.n_states <= dfa_fwd.n_states
    rc = mt.main(["dfa-determinize", str(src), str(tmp_path / "g.det.dfa")])
    assert rc == 0


def test_modeltools_nextword_cli(tmp_path, capsys):
    from julius_tpu.tools import modeltools as mt

    prefix = str(tmp_path / "cmdgram")
    (tmp_path / "cmdgram.grammar").write_text(GRAMMAR)
    (tmp_path / "cmdgram.voca").write_text(VOCA)
    G.mkdfa(prefix)
    rc = mt.main(["nextword", prefix, "", "silb", "silb go"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert lines[0].startswith("(begin): silb")
    assert "go" in lines[1] and "stop" in lines[1]
    # after "silb go": either object nouns or the end silence
    assert "left" in lines[2] and "sile" in lines[2]
