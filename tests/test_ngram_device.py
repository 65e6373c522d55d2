"""Device N-gram hash tables: narrow (packed uint32) vs wide (two-column
keys, the reference's --enable-words-int role) vs the host LM."""

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.io.arpa import NGramLM
from julius_tpu.search.ngram_device import (bigram_score, bigram_score_fast,
                                            build_device_ngram)


def _random_lm(V, n_bi, seed=0):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(V)]
    uni = {(i,): (float(-1 - 2 * rng.random()), float(-0.5 * rng.random()))
           for i in range(V)}
    bi = {}
    for _ in range(n_bi):
        v, w = int(rng.integers(V)), int(rng.integers(V))
        bi[(v, w)] = (float(-0.3 - 1.5 * rng.random()), 0.0)
    return NGramLM(order=2, words=words,
                   word_index={w: i for i, w in enumerate(words)},
                   ngrams=[uni, bi], bos_id=0, eos_id=1)


@pytest.fixture(scope="module")
def lm():
    return _random_lm(200, 900)


def test_narrow_matches_host(lm):
    ng = build_device_ngram(lm)
    assert not ng.wide
    rng = np.random.default_rng(1)
    v = rng.integers(0, 200, size=64).astype(np.int32)
    w = rng.integers(0, 200, size=64).astype(np.int32)
    got = np.asarray(bigram_score(ng, jnp.asarray(v), jnp.asarray(w)))
    want = np.array([lm.logprob((int(a),), int(b)) for a, b in zip(v, w)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wide_matches_narrow(lm):
    ng_n = build_device_ngram(lm)
    ng_w = build_device_ngram(lm, force_wide=True)
    assert ng_w.wide and ng_w.bi_rows.shape[1] == 3
    rng = np.random.default_rng(2)
    v = rng.integers(-1, 200, size=128).astype(np.int32)
    w = rng.integers(0, 200, size=128).astype(np.int32)
    a = np.asarray(bigram_score(ng_n, jnp.asarray(v), jnp.asarray(w)))
    b = np.asarray(bigram_score(ng_w, jnp.asarray(v), jnp.asarray(w)))
    np.testing.assert_array_equal(a, b)
    # the fused per-query path too
    vq = np.maximum(v, 0)
    uni = np.asarray(ng_w.uni)
    bo = np.asarray(ng_w.bo_uni)
    c = np.asarray(bigram_score_fast(
        ng_w, jnp.asarray(v), jnp.asarray(bo[vq]), jnp.asarray(w),
        jnp.asarray(uni[w])))
    np.testing.assert_array_equal(a, c)


def test_vocab_past_16bit_limit():
    """V > 65535 switches to wide keys automatically and probes stay
    exact where packed uint32 keys would alias."""
    V = 70000
    lm = _random_lm(V, 4000, seed=3)
    ng = build_device_ngram(lm)
    assert ng.wide
    items = list(lm.ngrams[1].items())[:256]
    v = np.asarray([c[0] for c, _ in items], np.int32)
    w = np.asarray([c[1] for c, _ in items], np.int32)
    got = np.asarray(bigram_score(ng, jnp.asarray(v), jnp.asarray(w)))
    want = np.array([p for _, (p, _) in items])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # absent pairs back off
    v2 = np.full(8, 69999, np.int32)
    w2 = np.arange(100, 108, dtype=np.int32)
    got2 = np.asarray(bigram_score(ng, jnp.asarray(v2), jnp.asarray(w2)))
    want2 = np.array([lm.logprob((69999,), int(b)) for b in w2])
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)
