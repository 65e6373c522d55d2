"""Sharded pass-1 vs single-device equivalence on the virtual mesh."""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh
from jax.experimental import mesh_utils

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.parallel.sharded_pass1 import (partition_network,
                                               sharded_pass1)
from julius_tpu.search import pass1 as p1

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)


@pytest.fixture(scope="module")
def setup():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    eng = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0,
                                                    trellis_topm=8))
    name2id = {n: i for i, n in enumerate(voca.names)}
    truth = ["<s>", "AB", "BA", "</s>"]
    rng = np.random.default_rng(0)
    pids = [hmm.phone_index[p] for w in truth
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    out_ext = np.asarray(jax.jit(eng._outprob)(jnp.asarray(frames[None]))[0])
    return eng, out_ext, truth


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_matches_single(setup, n_shards):
    eng, out_ext, truth = setup
    T = out_ext.shape[0]

    single = p1.pass1_decode(eng.dev_net, eng.ngram_dev, eng.p1_cfg,
                             jnp.asarray(out_ext), jnp.asarray(T))

    devs = mesh_utils.create_device_mesh(
        (n_shards,), devices=jax.devices()[:n_shards])
    mesh = Mesh(devs, ("tp",))
    snet = partition_network(eng.net, eng.dev_net, n_shards)
    sharded = sharded_pass1(mesh, snet, eng.ngram_dev, eng.p1_cfg,
                            jnp.asarray(out_ext), T)

    # identical trellis word-end records every frame
    sw = np.asarray(single.word)
    shw = np.asarray(sharded.word)
    ss = np.asarray(single.score)
    shs = np.asarray(sharded.score)
    for t in range(T):
        # compare as sets of (word, score): the top-k tie order between
        # equal scores may differ across reduction orders
        a = sorted((int(w), round(float(s), 3))
                   for w, s in zip(sw[t], ss[t]) if w >= 0)
        b = sorted((int(w), round(float(s), 3))
                   for w, s in zip(shw[t], shs[t]) if w >= 0)
        assert a == b, f"frame {t}: {a} != {b}"


def test_sharded_backtrace_decodes(setup):
    eng, out_ext, truth = setup
    T = out_ext.shape[0]
    devs = mesh_utils.create_device_mesh((4,), devices=jax.devices()[:4])
    mesh = Mesh(devs, ("tp",))
    snet = partition_network(eng.net, eng.dev_net, 4)
    tr = sharded_pass1(mesh, snet, eng.ngram_dev, eng.p1_cfg,
                       jnp.asarray(out_ext), T)
    tr_host = jax.tree_util.tree_map(np.asarray, tr)
    r = p1.backtrace(tr_host, T, eng.net.tail_word)
    assert r is not None
    words = [eng.voca.names[w] for w in r["words"]]
    assert words == truth
