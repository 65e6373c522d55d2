"""Decode-network cache tests."""

import numpy as np
import pytest

from julius_tpu.cache import (build_network_cached, load_network,
                              network_digest, save_network)
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.search.network import build_network

from fixtures import make_dict_text, make_hmmdefs_text


@pytest.fixture()
def models():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    return hmm, voca


def nets_equal(a, b):
    for f in ("score_idx", "in_src", "in_lp", "entry_word", "entry_lp",
              "exit_word", "exit_lp", "word_node_ofs"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
    assert a.n_score_rows == b.n_score_rows
    assert a.head_word == b.head_word and a.tail_word == b.tail_word


def test_save_load_roundtrip(models, tmp_path):
    hmm, voca = models
    net = build_network(hmm, voca)
    p = str(tmp_path / "net.npz")
    save_network(net, p)
    net2 = load_network(p)
    nets_equal(net, net2)


def test_cached_build_hits(models, tmp_path):
    hmm, voca = models
    d = str(tmp_path / "cache")
    n1 = build_network_cached(hmm, voca, cache_dir=d)
    import os
    files = os.listdir(d)
    assert len(files) == 1
    n2 = build_network_cached(hmm, voca, cache_dir=d)
    nets_equal(n1, n2)
    assert os.listdir(d) == files     # no rebuild


def test_digest_changes_with_inputs(models):
    hmm, voca = models
    d1 = network_digest(hmm, voca)
    d2 = network_digest(hmm, voca, iwsp=True)
    assert d1 != d2
    voca.add("NEW", ["a"])
    assert network_digest(hmm, voca) != d1
