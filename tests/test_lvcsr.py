"""Tied-triphone LVCSR configuration (the reference's 20k-word
dictation capability, README.md:24, scaled down for the CPU suite).

Exercises the full triphone stack end to end: HMMList logical->physical
tying (rdhmmlist.c role), shared-senone tied states, cross-word pseudo
CD sets (cdset.c), network-aligned generative utterances, and the
two-pass decode.  Truth is known by construction; the utterances follow
the LM (synth._lm_sampler), so the model-optimal decode is the truth
sequence for most draws.
"""

import numpy as np
import jax.numpy as jnp

from julius_tpu.config import SearchConfig
from julius_tpu.tools.synth import lvcsr_engine, make_lvcsr_utts


def _decode(eng, protos, n, seed):
    truths, windows, lens = make_lvcsr_utts(eng, protos, n, 120, 11,
                                            min_words=3, max_words=6,
                                            seed=seed)
    T = max(lens)
    feats = np.zeros((n, T, 120 * 11), np.float32)
    for u, w in enumerate(windows):
        feats[u, :w.shape[0]] = w
    res = eng.decode_features(jnp.asarray(feats),
                              jnp.asarray(lens, dtype=jnp.int32))
    ok = 0
    for u in range(n):
        hyp = [t for t in res[u].texts if t]
        tru = [w for w in truths[u] if w not in ("<s>", "</s>")]
        ok += hyp == tru
    return ok, res


def test_lvcsr_triphone_decode():
    eng, protos = lvcsr_engine(n_words=400, n_base=40, variants=50,
                               hidden=512, n_layers=2)
    assert eng.hmm.names_are_triphone
    assert len(eng.hmm.logical_map) > 100      # HMMList populated
    assert eng.net.pseudo is not None          # cross-word pseudo sets
    ok, res = _decode(eng, protos, 6, seed=11)
    assert ok >= 4, f"{ok}/6 exact on the tied-triphone config"
    assert sum(r.from_pass == 2 for r in res if r.valid) >= 4


def test_lvcsr_device_and_host_pass2_agree():
    """The device A* must match or beat the host re-scan's result
    QUALITY on the triphone config: same model, same inputs, so a
    device best-path score clearly below the host's is a search
    regression.  (The sequences themselves may differ — both searches
    are approximate and the generative model admits near-ties.)"""
    sc = SearchConfig(lm_weight=8.0, lm_penalty=-2.0)
    eng_d, protos = lvcsr_engine(n_words=400, n_base=40, variants=50,
                                 hidden=512, n_layers=2, search=sc)
    sc_h = SearchConfig(lm_weight=8.0, lm_penalty=-2.0,
                        pass2_device=False)
    eng_h, _ = lvcsr_engine(n_words=400, n_base=40, variants=50,
                            hidden=512, n_layers=2, search=sc_h)
    truths, windows, lens = make_lvcsr_utts(eng_d, protos, 4, 120, 11,
                                            min_words=3, max_words=5,
                                            seed=5)
    T = max(lens)
    feats = np.zeros((4, T, 120 * 11), np.float32)
    for u, w in enumerate(windows):
        feats[u, :w.shape[0]] = w
    fd = jnp.asarray(feats)
    ld = jnp.asarray(lens, dtype=jnp.int32)
    rd = eng_d.decode_features(fd, ld)
    rh = eng_h.decode_features(fd, ld)
    for u in range(4):
        if rd[u].from_pass == 2 and rh[u].from_pass == 2:
            assert rd[u].score >= rh[u].score - 1.0, (
                u, rd[u].score, rh[u].score, rd[u].words, rh[u].words)
