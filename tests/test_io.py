"""IO layer tests: HTK hmmdefs / dict / ARPA / DFA / HTK param round trips."""

import math
import os

import numpy as np
import pytest

from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.io.htk_dict import (
    load_htkdict, parse_dict_line, Vocabulary, word_internal_triphones,
)
from julius_tpu.io.arpa import parse_arpa, load_arpa, write_arpa
from julius_tpu.io.dfa import load_dfa
from julius_tpu.io.htk_param import HTKParam, read_htk_param, write_htk_param
from julius_tpu.io.wav import read_wav, write_wav
from julius_tpu.utils.logadd import LOG_ZERO

import io as _io
import sys

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import (  # noqa: E402
    make_hmmdefs_text, make_dict_text, make_arpa_text, make_dfa_text,
)


class TestHmmdefs:
    def test_basic_parse(self):
        hmm = parse_hmmdefs_text(make_hmmdefs_text())
        assert hmm.n_phones == 4
        assert hmm.phone_names == ["a", "b", "c", "sil"]
        assert hmm.dim == 4
        # 4 phones x 3 states, 2 mixtures each
        assert hmm.n_states == 12
        assert hmm.n_gauss == 24
        assert hmm.max_mix == 2
        np.testing.assert_array_equal(hmm.phone_ns, [3, 3, 3, 3])

    def test_transitions_are_log(self):
        hmm = parse_hmmdefs_text(make_hmmdefs_text())
        t = hmm.phone_trans[0]
        assert t[0, 1] == pytest.approx(0.0, abs=1e-5)       # ln 1.0
        assert t[1, 1] == pytest.approx(math.log(0.6), abs=1e-4)
        assert t[1, 2] == pytest.approx(math.log(0.4), abs=1e-4)
        assert t[1, 3] <= LOG_ZERO / 2

    def test_gconst_computed(self):
        hmm = parse_hmmdefs_text(make_hmmdefs_text(dim=3))
        g = 0
        var = 1.0 / hmm.ivars[g]
        expect = 3 * math.log(2 * math.pi) + np.sum(np.log(var))
        assert hmm.gconst[g] == pytest.approx(expect, rel=1e-4)

    def test_macros(self):
        text = (
            '~o <VecSize> 2 <MFCC> <DIAGC>\n'
            '~v "gvar" <Variance> 2\n 1.0 2.0\n'
            '~t "tr" <TransP> 3\n 0 1 0\n 0 0.5 0.5\n 0 0 0\n'
            '~s "st" <Mean> 2\n 0.5 -0.5\n ~v "gvar"\n'
            '~h "x" <BeginHMM> <NumStates> 3\n'
            '<State> 2 ~s "st"\n'
            '~t "tr"\n'
            '<EndHMM>\n'
            '~h "y" <BeginHMM> <NumStates> 3\n'
            '<State> 2 ~s "st"\n'
            '~t "tr"\n'
            '<EndHMM>\n'
        )
        hmm = parse_hmmdefs_text(text)
        assert hmm.n_phones == 2
        # shared ~s macro -> single senone
        assert hmm.n_states == 1
        assert hmm.phone_states[0, 0] == hmm.phone_states[1, 0]
        np.testing.assert_allclose(1.0 / hmm.ivars[0], [1.0, 2.0], rtol=1e-5)

    def test_tiedmix(self):
        text = (
            '~o <VecSize> 2 <MFCC> <DIAGC>\n'
            '~m "cb1" <Mean> 2\n 0 0\n <Variance> 2\n 1 1\n'
            '~m "cb2" <Mean> 2\n 1 1\n <Variance> 2\n 1 1\n'
            '~h "x" <BeginHMM> <NumStates> 3\n'
            '<State> 2 <NumMixes> 2 <TMix> cb 0.7 0.3\n'
            '<TransP> 3\n 0 1 0\n 0 0.5 0.5\n 0 0 0\n'
            '<EndHMM>\n'
        )
        hmm = parse_hmmdefs_text(text)
        assert hmm.n_gauss == 2
        s = hmm.phone_states[0, 0]
        assert list(hmm.state_mix[s]) == [0, 1]
        np.testing.assert_allclose(
            hmm.state_lw[s], [math.log(0.7), math.log(0.3)], rtol=1e-5)

    def test_sid(self):
        text = (
            '~o <VecSize> 2 <USER> <DIAGC>\n'
            '~h "x" <BeginHMM> <NumStates> 3\n'
            '<State> 2 <SID> 42 <Mean> 2\n 0 0\n <Variance> 2\n 1 1\n'
            '<TransP> 3\n 0 1 0\n 0 0.5 0.5\n 0 0 0\n'
            '<EndHMM>\n'
        )
        hmm = parse_hmmdefs_text(text)
        assert hmm.state_sid[hmm.phone_states[0, 0]] == 42


class TestDict:
    def test_parse(self, tmp_path):
        p = tmp_path / "test.dict"
        p.write_text(make_dict_text())
        voca = load_htkdict(str(p))
        assert voca.n_words == 6
        assert voca.names[2] == "AB"
        assert voca.outputs[2] == "ab"
        assert voca.phones[2] == ["a", "b"]
        assert voca.outputs[0] == ""

    def test_transparent_and_weight(self):
        voca = Vocabulary()
        parse_dict_line("FOO\t{foo}\ta b c", voca)
        assert voca.transparent[0]
        parse_dict_line("BAR [bar noise] :2.5 b a", voca)
        assert voca.outputs[1] == "bar noise"
        assert voca.weight[1] == 2.5
        assert voca.phones[1] == ["b", "a"]

    def test_classprob(self):
        voca = Vocabulary()
        parse_dict_line("CLS @-0.5 word [out] a b", voca)
        assert voca.names[0] == "CLS"
        assert voca.cprob[0] == -0.5
        assert voca.phones[0] == ["a", "b"]

    def test_no_output_field(self):
        voca = Vocabulary()
        parse_dict_line("W1 a b", voca)
        assert voca.outputs[0] == "W1"
        assert voca.phones[0] == ["a", "b"]

    def test_triphone_conversion(self):
        assert word_internal_triphones(["a"]) == ["a"]
        assert word_internal_triphones(["a", "b"]) == ["a+b", "a-b"]
        assert word_internal_triphones(["a", "b", "c"]) == [
            "a+b", "a-b+c", "b-c"]


class TestArpa:
    def test_parse(self):
        lm = parse_arpa(_io.StringIO(make_arpa_text()))
        assert lm.order == 2
        assert lm.n_words == 6
        assert lm.bos_id == lm.word_index["<s>"]
        assert lm.eos_id == lm.word_index["</s>"]

    def test_backoff_walk(self):
        text = (
            "\\data\\\n"
            "ngram 1=3\nngram 2=2\n"
            "\n\\1-grams:\n"
            "-1.0\t<s>\t-0.5\n"
            "-0.7\tA\t-0.2\n"
            "-0.9\tB\n"
            "\n\\2-grams:\n"
            "-0.3\t<s> A\n"
            "-0.4\tA B\n"
            "\n\\end\\\n"
        )
        lm = parse_arpa(_io.StringIO(text))
        a = lm.word_index["A"]
        b = lm.word_index["B"]
        s = lm.word_index["<s>"]
        assert lm.logprob((s,), a) == pytest.approx(-0.3)
        assert lm.logprob((a,), b) == pytest.approx(-0.4)
        # backoff: P(A|B) = bo(B) + P(A) = 0 + -0.7 (B has no bow -> 0)
        assert lm.logprob((b,), a) == pytest.approx(-0.7)
        # backoff with bow: P(B|<s>) = bo(<s>) + P(B) = -0.5 + -0.9
        assert lm.logprob((s,), b) == pytest.approx(-1.4)

    def test_roundtrip(self, tmp_path):
        lm = parse_arpa(_io.StringIO(make_arpa_text()))
        p = tmp_path / "out.arpa"
        write_arpa(lm, str(p))
        lm2 = load_arpa(str(p))
        assert lm2.order == lm.order
        for k in range(lm.order):
            assert len(lm2.ngrams[k]) == len(lm.ngrams[k])
        a = lm.word_index["AB"]
        a2 = lm2.word_index["AB"]
        assert lm.logprob((), a) == pytest.approx(lm2.logprob((), a2), abs=1e-4)

    def test_bigram_arrays(self):
        lm = parse_arpa(_io.StringIO(make_arpa_text()))
        keys, probs, bo = lm.bigram_arrays()
        assert len(keys) == len(lm.ngrams[1])
        assert np.all(np.diff(keys) > 0)


class TestDfa:
    def test_parse(self, tmp_path):
        p = tmp_path / "g.dfa"
        p.write_text(make_dfa_text())
        dfa = load_dfa(str(p))
        assert dfa.n_states == 3
        assert dfa.n_terms == 2
        assert dfa.accept == [False, False, True]
        assert dfa.arcs[0] == [(0, 1)]
        assert dfa.arcs[1] == [(1, 2)]

    def test_category_pairs(self, tmp_path):
        # Julius .dfa files encode the REVERSED grammar (mkdfa.py
        # gen_reverse_grammar): this DFA consumes cat0 then cat1, so the
        # forward sentences are "cat1 cat0".
        p = tmp_path / "g.dfa"
        p.write_text(make_dfa_text())
        dfa = load_dfa(str(p))
        cp, cp_begin, cp_end = dfa.category_pair_matrix()
        assert cp_begin[1] and not cp_begin[0]   # sentences start with cat1
        assert cp_end[0] and not cp_end[1]       # and end with cat0
        assert cp[1, 0]          # cat 0 can follow cat 1 (forward order)
        assert not cp[0, 1]
        assert dfa.accepts_forward([1, 0])
        assert not dfa.accepts_forward([0, 1])


class TestHtkParam:
    def test_roundtrip(self, tmp_path):
        data = np.random.default_rng(0).standard_normal((17, 13)).astype(np.float32)
        p = tmp_path / "x.mfc"
        write_htk_param(str(p), HTKParam(data=data, samp_period=100000,
                                         kind="MFCC_E_Z"))
        back = read_htk_param(str(p))
        assert back.kind == "MFCC_E_Z"
        assert back.samp_period == 100000
        np.testing.assert_allclose(back.data, data, rtol=1e-6)


class TestWav:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        s = (rng.standard_normal(1600) * 1000).astype(np.float32)
        p = tmp_path / "x.wav"
        write_wav(str(p), s, 16000)
        back, rate = read_wav(str(p))
        assert rate == 16000
        np.testing.assert_allclose(back, np.round(s).clip(-32768, 32767),
                                   atol=1.0)
