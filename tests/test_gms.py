"""Gaussian Mixture Selection (reference gms.c / mkgshmm)."""

import io

import numpy as np
import jax
import jax.numpy as jnp

from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.ops.gmm import build_gmm_tables, senone_scores
from julius_tpu.ops.gms import build_gms, gms_senone_scores

from fixtures import make_hmmdefs_text


def _models():
    main = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    gs = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=1,
        seed=9))
    return main, gs


def test_gms_all_selected_equals_full():
    main, gs = _models()
    tables = build_gmm_tables(main)
    gms = build_gms(main, gs, gsnum=gs.n_states)   # select everything
    x = jnp.asarray(np.random.default_rng(0).standard_normal((7, 4)),
                    jnp.float32)
    full = np.asarray(senone_scores(tables, x))
    mixed = np.asarray(gms_senone_scores(tables, gms, x))
    assert np.allclose(full, mixed, atol=1e-5)


def test_gms_fallback_uses_gs_score():
    main, gs = _models()
    tables = build_gmm_tables(main)
    gms = build_gms(main, gs, gsnum=2)             # prune most states
    gs_tables = build_gmm_tables(gs)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((5, 4)),
                    jnp.float32)
    full = np.asarray(senone_scores(tables, x))
    gs_sc = np.asarray(senone_scores(gs_tables, x))
    mixed = np.asarray(gms_senone_scores(tables, gms, x))
    s2g = np.asarray(gms.state2gs)
    # every score is either the full score or the GS parent's score
    for t in range(mixed.shape[0]):
        kth = np.sort(gs_sc[t])[-2]
        for s in range(mixed.shape[1]):
            g = s2g[s]
            if g < 0 or gs_sc[t, g] >= kth:
                assert np.isclose(mixed[t, s], full[t, s], atol=1e-5)
            else:
                assert np.isclose(mixed[t, s], gs_sc[t, g], atol=1e-5)


def test_mkgshmm_roundtrip(tmp_path):
    main, _ = _models()
    src = tmp_path / "mono.hmmdefs"
    src.write_text(make_hmmdefs_text(
        phones=("a", "b", "sil"), dim=4, n_states=3, n_mix=1))
    dst = tmp_path / "gs.hmmdefs"
    from julius_tpu.tools.modeltools import cmd_mkgshmm
    assert cmd_mkgshmm([str(src), str(dst)]) == 0
    gs = parse_hmmdefs_text(dst.read_text())
    ref = parse_hmmdefs_text(src.read_text())
    assert gs.n_phones == ref.n_phones
    assert gs.n_states == ref.n_states
    # scores identical: the rewrite only introduces ~s macros
    t1 = build_gmm_tables(gs)
    t2 = build_gmm_tables(ref)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 4)),
                    jnp.float32)
    assert np.allclose(np.asarray(senone_scores(t1, x)),
                       np.asarray(senone_scores(t2, x)), atol=1e-6)


def test_gms_engine_decode():
    """Engine with -gshmm still decodes the generating sequence when the
    GS model is the main model's own monophones (selection keeps the
    true states on top)."""
    from julius_tpu.config import SearchConfig, AMConfig
    from julius_tpu.engine import Engine
    from julius_tpu.io.arpa import parse_arpa
    from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
    from fixtures import (make_arpa_text, make_dict_text,
                          sample_states_and_frames)

    main, gs = _models()
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    am = AMConfig(gsnum=6)
    eng = Engine(main, voca, lm, search=SearchConfig(lm_weight=2.0),
                 am_cfg=am, gshmm=gs)
    assert eng.gms is not None
    rng = np.random.default_rng(3)
    name2id = {n: i for i, n in enumerate(voca.names)}
    truth = ["<s>", "AB", "</s>"]
    pids = [main.phone_index[p] for w in truth
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(main, pids, rng)
    res = eng.decode_features(frames[None], np.asarray([len(frames)]))
    assert res[0].words == truth
