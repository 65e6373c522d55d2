"""Binary N-gram (bingram v5) round-trip tests."""

import io

import numpy as np
import pytest

from julius_tpu.io.arpa import parse_arpa, write_arpa, load_arpa
from julius_tpu.io.bingram import read_bingram, write_bingram

from fixtures import make_arpa_text


def make_trigram_text():
    return """
\\data\\
ngram 1=5
ngram 2=6
ngram 3=4

\\1-grams:
-1.0\t<s>\t-0.4
-1.2\t</s>
-0.8\tA\t-0.3
-0.9\tB\t-0.2
-1.5\tC\t-0.1

\\2-grams:
-0.5\t<s> A\t-0.2
-0.6\tA B\t-0.25
-0.7\tB C\t-0.15
-0.9\tB </s>
-1.0\tC </s>
-1.1\tA C\t-0.3

\\3-grams:
-0.3\t<s> A B
-0.4\tA B C
-0.5\tA B </s>
-0.6\tB C </s>

\\end\\
"""


@pytest.mark.parametrize("text_fn", [make_arpa_text, make_trigram_text])
def test_bingram_roundtrip(tmp_path, text_fn):
    lm = parse_arpa(io.StringIO(text_fn()))
    p = str(tmp_path / "lm.bingram")
    write_bingram(p, lm)
    lm2 = read_bingram(p)
    assert lm2.order == lm.order
    assert lm2.words == lm.words
    assert lm2.direction == lm.direction
    assert lm2.bos_id == lm.bos_id and lm2.eos_id == lm.eos_id
    for k in range(lm.order):
        assert set(lm2.ngrams[k]) == set(lm.ngrams[k])
        for t, (prob, bo) in lm.ngrams[k].items():
            p2, b2 = lm2.ngrams[k][t]
            assert abs(p2 - prob) < 1e-6
            if k < lm.order - 1:
                assert abs(b2 - bo) < 1e-6


def test_bingram_logprob_identical(tmp_path):
    lm = parse_arpa(io.StringIO(make_trigram_text()))
    p = str(tmp_path / "lm.bingram")
    write_bingram(p, lm)
    lm2 = read_bingram(p)
    wi = lm.word_index
    for ctx, w in [((wi["<s>"],), wi["A"]),
                   ((wi["<s>"], wi["A"]), wi["B"]),
                   ((wi["A"], wi["B"]), wi["C"]),
                   ((wi["C"],), wi["A"]),       # backoff path
                   ((), wi["B"])]:
        assert abs(lm.logprob(ctx, w) - lm2.logprob(ctx, w)) < 1e-6


def test_bingram_rejects_garbage(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"not a bingram at all" + b"\x00" * 600)
    with pytest.raises(ValueError):
        read_bingram(str(p))
