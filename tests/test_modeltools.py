"""Offline model tool CLI tests."""

import numpy as np
import pytest

from julius_tpu.tools import modeltools

from fixtures import make_arpa_text, make_hmmdefs_text


def test_mkbingram_binlm2arpa_roundtrip(tmp_path, capsys):
    (tmp_path / "lm.arpa").write_text(make_arpa_text())
    assert modeltools.main(["mkbingram", str(tmp_path / "lm.arpa"),
                            str(tmp_path / "lm.bin")]) == 0
    assert modeltools.main(["binlm2arpa", str(tmp_path / "lm.bin"),
                            str(tmp_path / "lm2.arpa")]) == 0
    from julius_tpu.io.arpa import load_arpa
    lm1 = load_arpa(str(tmp_path / "lm.arpa"))
    lm2 = load_arpa(str(tmp_path / "lm2.arpa"))
    assert set(lm1.ngrams[1]) == set(lm2.ngrams[1])
    for t, (p, _b) in lm1.ngrams[1].items():
        assert abs(lm2.ngrams[1][t][0] - p) < 1e-4


def test_mkbinhmm(tmp_path, capsys):
    (tmp_path / "am.hmm").write_text(make_hmmdefs_text(dim=8))
    conf = tmp_path / "Config"
    conf.write_text("SOURCERATE = 625\nTARGETKIND = MFCC_E\nNUMCEPS = 12\n")
    assert modeltools.main([
        "mkbinhmm", "-htkconf", str(conf),
        str(tmp_path / "am.hmm"), str(tmp_path / "am.bin")]) == 0
    from julius_tpu.io.binhmm import read_binhmm
    hmm, para = read_binhmm(str(tmp_path / "am.bin"))
    assert para is not None and para.sample_rate == 16000
    assert hmm.n_phones == 4


GRAMMAR = "S : NS_B WORD NS_E\nWORD : W\n"
VOCA = "% NS_B\nsilb sil\n% NS_E\nsile sil\n% W\nhello a b\nbye b a\n"


def test_mkdfa_and_checks(tmp_path, capsys):
    (tmp_path / "g.grammar").write_text(GRAMMAR)
    (tmp_path / "g.voca").write_text(VOCA)
    assert modeltools.main(["mkdfa", str(tmp_path / "g")]) == 0
    assert modeltools.main(["accept-check", str(tmp_path / "g"),
                            "silb hello sile"]) == 0
    assert modeltools.main(["accept-check", str(tmp_path / "g"),
                            "hello silb"]) == 1
    assert modeltools.main(["generate", str(tmp_path / "g"), "-n", "3"]) == 0
    out = capsys.readouterr().out
    assert "accepted" in out and "rejected" in out


def test_generate_ngram(tmp_path, capsys):
    (tmp_path / "lm.arpa").write_text(make_arpa_text())
    assert modeltools.main(["generate-ngram", str(tmp_path / "lm.arpa"),
                            "-n", "4"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 4
