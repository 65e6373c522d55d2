"""WER scoring + synthetic accuracy regression gate."""

import pytest

from julius_tpu.tools.wer import WERResult, align_counts, synthetic_eval


def test_align_counts():
    assert align_counts("a b c".split(), "a b c".split()) == (0, 0, 0)
    assert align_counts("a b c".split(), "a x c".split()) == (1, 0, 0)
    assert align_counts("a b c".split(), "a c".split()) == (0, 1, 0)
    assert align_counts("a b c".split(), "a b x c".split()) == (0, 0, 1)
    assert align_counts([], "a".split()) == (0, 0, 1)


def test_wer_result():
    r = WERResult()
    r.add("a b c d".split(), "a b c d".split())
    r.add("a b c d".split(), "a x c".split())
    assert r.n_ref == 8
    assert r.n_sub == 1 and r.n_del == 1
    assert abs(r.wer - 2 / 8) < 1e-9
    assert abs(r.ser - 0.5) < 1e-9


def test_synthetic_accuracy_clean():
    """Noise-free synthetic decode must be near-perfect.  (Exactly 0 is
    not guaranteed: the generative toy setup has genuinely ambiguous
    phone sequences where the LM prefers a different segmentation.)"""
    res = synthetic_eval(noise=0.0, n_utts=15, seed=1)
    assert res.wer < 0.05, str(res)


def test_synthetic_accuracy_noisy():
    """Moderate noise should stay under 20% WER; factor-2 must not be
    worse than factor-1 on the same data."""
    r1 = synthetic_eval(noise=0.8, n_utts=20, seed=2, factoring=1)
    assert r1.wer < 0.2, str(r1)
    r2 = synthetic_eval(noise=0.8, n_utts=20, seed=2, factoring=2)
    assert r2.wer <= r1.wer + 0.05, f"f1={r1} f2={r2}"
