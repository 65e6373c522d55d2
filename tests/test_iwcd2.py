"""Strict inter-word CD pass-2 (v2) tests.

Reference: search_bestfirst_v2.c (PASS2_STRICT_IWCD "standard" setup):
the re-scan resolves each word's head triphone against the hypothesis's
preceding word instead of the left-context-free pseudo set (v1).
"""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.search.iwcd2 import StrictIWCDTables
from julius_tpu.utils.logadd import LOG_ZERO

from fixtures import make_hmmdefs_text


PHONES = ("a", "b", "c", "sil", "a-c+a", "b-c+a")


@pytest.fixture(scope="module")
def models():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=PHONES, dim=4, n_states=3, n_mix=1))
    assert hmm.names_are_triphone
    voca = Vocabulary()
    for line in ["<s>\t[]\tsil", "</s>\t[]\tsil",
                 "XA\t[xa]\ta", "XB\t[xb]\tb", "YY\t[yy]\tc a"]:
        parse_dict_line(line, voca)
    arpa = """
\\data\\
ngram 1=5
ngram 2=6

\\1-grams:
-0.5\t<s>\t-0.3
-0.5\t</s>\t-0.3
-0.6\tXA\t-0.3
-0.6\tXB\t-0.3
-0.6\tYY\t-0.3

\\2-grams:
-0.2\t<s> XA
-0.2\t<s> XB
-0.2\tXA YY
-0.2\tXB YY
-0.2\tYY </s>
-4.0\tXA </s>

\\end\\
"""
    lm = parse_arpa(io.StringIO(arpa))
    return hmm, voca, lm


def test_tables_resolve_head_triphones(models):
    hmm, voca, lm = models
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(strict_iwcd2=True))
    tabs = eng.iwcd2_tables
    assert tabs is not None
    yy = voca.names.index("YY")
    ca = tabs.class_of_phone["a"]       # left context class of XA / </s>
    cb = tabs.class_of_phone["b"]       # left context class of XB
    # YY's head phone 'c+a' resolves exactly per left context
    np.testing.assert_array_equal(
        np.asarray(tabs.head_sidx[yy, ca]),
        hmm.phone_states[hmm.phone_index["a-c+a"]])
    np.testing.assert_array_equal(
        np.asarray(tabs.head_sidx[yy, cb]),
        hmm.phone_states[hmm.phone_index["b-c+a"]])
    # class 0 (no context) keeps the v1 rows
    n0 = eng.net.word_node_ofs[yy]
    np.testing.assert_array_equal(
        np.asarray(tabs.head_sidx[yy, 0]),
        eng.net.score_idx[n0:n0 + 3])
    assert tabs.n_resolved >= 2


def _rows(hmm, voca, T=40):
    """Hand-built senone rows: truth = <s> XA YY </s>; the head frames
    of YY match 'a-c+a' but the DISTRACTOR 'b-c+a' scores even higher,
    so v1's left-context-free pseudo max overestimates YY's AM."""
    S = hmm.n_states
    LO = -10.0
    rows = np.full((T, S), LO, np.float32)

    def set_phone(name, t0, t1, val):
        pid = hmm.phone_index[name]
        for j in range(int(hmm.phone_ns[pid])):
            rows[t0:t1, int(hmm.phone_states[pid, j])] = val

    set_phone("sil", 0, 8, 0.0)
    set_phone("a", 8, 16, 0.0)          # XA
    set_phone("a-c+a", 16, 24, -0.5)    # YY head, true left context 'a'
    set_phone("b-c+a", 16, 24, 0.0)     # distractor (wrong left context)
    set_phone("c", 16, 24, -3.0)
    set_phone("a", 24, 32, 0.0)         # YY tail
    set_phone("sil", 32, 40, 0.0)
    return rows, T


def test_v2_scores_exact_context(models):
    """v1 (pseudo max over {a-c+a, b-c+a}) uses the distractor's higher
    score at YY's head; v2 must charge the exact 'a-c+a' rows after XA —
    same transcript, strictly lower (= correct) score, with the AM delta
    explained by the head-frame difference."""
    hmm, voca, lm = models
    sc = dict(lm_weight=2.0, lm_weight2=2.0, nbest=2, enable_pass2=True)
    e1 = Engine(hmm, voca, lm, search=SearchConfig(**sc))
    e2 = Engine(hmm, voca, lm,
                search=SearchConfig(strict_iwcd2=True, **sc))
    rows, T = _rows(hmm, voca)
    r1 = e1.decode_outprob(rows[None], jnp.asarray([T]))[0]
    r2 = e2.decode_outprob(rows[None], jnp.asarray([T]))[0]
    assert r1.words == ["<s>", "XA", "YY", "</s>"], r1.words
    assert r2.words == ["<s>", "XA", "YY", "</s>"], r2.words
    assert r2.from_pass == 2 and r1.from_pass == 2
    # hand-computed: v1's head rows are the iwcd1 'best'-3 AVERAGE of
    # the pseudo members {a-c+a: -0.5, b-c+a: 0.0} = -0.25/frame
    # (ops/gmm.py aggregate_pseudo, default AMConfig.iwcd_scheme);
    # v2 charges the exact a-c+a -0.5/frame.  YY's head occupies its 8
    # frames (16..23) in both, so delta == 8 * (0.5 - 0.25) = 2.0
    delta = r1.score - r2.score
    assert abs(delta - 2.0) < 0.2, f"delta {delta}"


def test_v2_no_context_keeps_v1(models):
    """Sentence-initial words (left class 0) score identically in v1
    and v2."""
    hmm, voca, lm = models
    sc = dict(lm_weight=2.0, lm_weight2=2.0, nbest=1, enable_pass2=True)
    e1 = Engine(hmm, voca, lm, search=SearchConfig(**sc))
    e2 = Engine(hmm, voca, lm,
                search=SearchConfig(strict_iwcd2=True, **sc))
    # utterance of only silence: single-word <s>-like decode
    S = hmm.n_states
    rows = np.full((12, S), -10.0, np.float32)
    pid = hmm.phone_index["sil"]
    for j in range(int(hmm.phone_ns[pid])):
        rows[:, int(hmm.phone_states[pid, j])] = 0.0
    r1 = e1.decode_outprob(rows[None], jnp.asarray([12]))[0]
    r2 = e2.decode_outprob(rows[None], jnp.asarray([12]))[0]
    assert r1.words == r2.words
    assert abs(r1.score - r2.score) < 1e-3


def test_pass1_rc_dynamic_tables(models):
    """Pass-1 per-last-word RC assignment (outprob_style.c:354): the
    node table must pin hand-resolved triphone rows, and decode scores
    must change vs the pseudo approximation by the head-frame delta."""
    from julius_tpu.config import AMConfig
    from julius_tpu.search.iwcd2 import build_rc_tables

    hmm, voca, lm = models
    sc = dict(lm_weight=2.0, lm_weight2=2.0, nbest=1, enable_pass2=False)
    e1 = Engine(hmm, voca, lm, search=SearchConfig(**sc))
    e2 = Engine(hmm, voca, lm, search=SearchConfig(**sc),
                am_cfg=AMConfig(head_rc_dynamic=True))
    assert e2.dev_net.rc_head is not None

    # table pinning: YY's first head node, class of 'a' -> 'a-c+a' rows
    rc_head, rc_sidx, lc_class = build_rc_tables(e2.net, hmm, voca, True)
    yy = voca.names.index("YY")
    xa = voca.names.index("XA")
    n0 = e2.net.word_node_ofs[yy]
    ca = int(lc_class[xa])
    for j in range(3):
        assert rc_head[n0 + j] >= 0
        assert rc_sidx[rc_head[n0 + j], ca] == \
            hmm.phone_states[hmm.phone_index["a-c+a"], j]

    rows, T = _rows(hmm, voca)
    r1 = e1.decode_outprob(rows[None], jnp.asarray([T]))[0]
    r2 = e2.decode_outprob(rows[None], jnp.asarray([T]))[0]
    assert r1.words == r2.words == ["<s>", "XA", "YY", "</s>"]
    # same hand-computed delta as the v2 re-scan: 8 head frames scored
    # exact a-c+a (-0.5) instead of the pseudo best-3 average (-0.25)
    delta = r1.score - r2.score
    assert abs(delta - 2.0) < 0.2, f"delta {delta}"
