"""Fused Pallas pass-1 kernel vs the XLA fallback: exact equivalence.

The fused path (search/pass1.py _pass1_batch_fused +
ops/pass1_kernel.py) auto-selects on TPU; here it is forced on and run
through the Pallas interpreter on the CPU backend, and its trellis must
match the vmap fallback bit-for-bit."""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.search import pass1 as p1

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)


@pytest.fixture
def force_fused():
    old = p1.FUSE_PASS1
    p1.FUSE_PASS1 = True
    yield
    p1.FUSE_PASS1 = old


def _trellis_equal(a, b):
    for name in a._fields:
        x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        # records are only meaningful where a word survived
        valid = np.asarray(a.word) >= 0
        assert np.array_equal(np.asarray(a.word), np.asarray(b.word)), name
        if x.dtype.kind == "f":
            assert np.allclose(np.where(valid, x, 0),
                               np.where(valid, y, 0), atol=1e-5), name
        else:
            assert np.array_equal(np.where(valid, x, 0),
                                  np.where(valid, y, 0)), name


def test_fused_matches_fallback_small(force_fused):
    """Tiny GMM engine (single node tile, ragged lengths)."""
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=2.0, trellis_topm=8))

    rng = np.random.default_rng(0)
    name2id = {n: i for i, n in enumerate(voca.names)}
    pids = [hmm.phone_index[p] for w in ("<s>", "AB", "</s>")
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    out1 = np.asarray(jax.jit(eng._outprob)(jnp.asarray(frames[None]))[0])
    T = out1.shape[0]
    B = 3
    out = np.stack([out1,
                    out1 + 0.1 * rng.standard_normal(out1.shape),
                    out1[::-1]]).astype(np.float32)
    nfr = np.asarray([T, T - 5, T - 11], np.int32)

    fused = p1.pass1_batch(eng.dev_net, eng.ngram_dev, eng.p1_cfg,
                           jnp.asarray(out), jnp.asarray(nfr))
    p1.FUSE_PASS1 = False
    ref = p1.pass1_batch(eng.dev_net, eng.ngram_dev, eng.p1_cfg,
                         jnp.asarray(out), jnp.asarray(nfr))
    _trellis_equal(ref, fused)

    # decoded words must match too
    for b in range(B):
        rf = p1.backtrace(jax.tree_util.tree_map(lambda a: a[b], fused),
                          int(nfr[b]), eng.net.tail_word)
        rr = p1.backtrace(jax.tree_util.tree_map(lambda a: a[b], ref),
                          int(nfr[b]), eng.net.tail_word)
        assert (rf is None) == (rr is None)
        if rf is not None:
            assert rf["words"] == rr["words"]


def test_fused_matches_fallback_multitile(force_fused):
    """Synthetic DNN engine big enough for multiple node tiles, so the
    inter-tile halo (shift across tile boundaries) is exercised."""
    from julius_tpu.tools.synth import flagship_engine

    eng = flagship_engine(n_words=120, n_phones=48, hidden=32, n_layers=1)
    N = int(eng.dev_net.score_idx.shape[0])
    from julius_tpu.ops.pass1_kernel import TILE_N
    assert N > TILE_N, "fixture too small to cover the halo path"

    rng = np.random.default_rng(1)
    B, L = 2, 8000
    wave = (rng.standard_normal((B, L)) * 1000).astype(np.float32)
    lengths = np.asarray([L, L - 3200], np.int32)
    feats, mask = jax.jit(eng._features)(jnp.asarray(wave),
                                         jnp.asarray(lengths))
    nfr = jnp.sum(mask.astype(jnp.int32), axis=-1)
    out = jax.jit(eng._outprob)(feats)

    fused = p1.pass1_batch(eng.dev_net, eng.ngram_dev, eng.p1_cfg,
                           out, nfr)
    p1.FUSE_PASS1 = False
    ref = p1.pass1_batch(eng.dev_net, eng.ngram_dev, eng.p1_cfg,
                         out, nfr)
    _trellis_equal(ref, fused)
