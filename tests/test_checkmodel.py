"""Model checker tests."""

import io

import pytest

from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.search.network import build_network
from julius_tpu.tools.checkmodel import (check_hmm, check_lm_coverage,
                                         check_network,
                                         check_triphone_coverage)

from fixtures import make_arpa_text, make_dict_text, make_hmmdefs_text


@pytest.fixture(scope="module")
def models():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    return hmm, voca, lm


def test_check_hmm(models):
    hmm, _, _ = models
    info = check_hmm(hmm)
    assert info["n_phones"] == 4
    assert info["n_states"] == 12
    assert info["n_tee_models"] == 0
    assert info["n_backward_arcs"] == 0


def test_triphone_coverage_mono(models):
    hmm, voca, _ = models
    cov = check_triphone_coverage(hmm, voca)
    assert cov["missing"] == 0
    assert cov["exact"] == cov["n_names"]


def test_triphone_coverage_missing():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(phones=("a", "sil")))
    voca = Vocabulary()
    voca.add("BAD", ["a", "zz"])      # zz not in the model
    cov = check_triphone_coverage(hmm, voca)
    assert cov["missing"] == 1
    assert "zz" in cov["missing_names"]


def test_check_network(models):
    hmm, voca, _ = models
    net = build_network(hmm, voca)
    info = check_network(net)
    assert info["n_nodes"] == net.n_nodes
    assert info["local_fast_path"]
    assert info["n_exit_nodes"] >= voca.n_words
    assert info["n_entry_nodes"] >= voca.n_words


def test_lm_coverage(models):
    hmm, voca, lm = models
    info = check_lm_coverage(voca, lm)
    assert info["oov"] == 0
    assert info["lm_order"] == 2
