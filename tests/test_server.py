"""Module / adinnet server protocol tests over loopback sockets."""

import io
import socket
import threading
import time

import numpy as np
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.server.adinnet import AdinnetClient, AdinnetServer
from julius_tpu.server.module import ModuleServer, result_to_xml
from julius_tpu.tools.serve import serve

from fixtures import make_arpa_text, make_dict_text, make_hmmdefs_text


@pytest.fixture(scope="module")
def engine():
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "sil"), dim=26, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text([("<s>", "[]", ["sil"]),
                                ("</s>", "[]", ["sil"]),
                                ("AB", "[ab]", ["a", "b"]),
                                ("BA", "[ba]", ["b", "a"])]).splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    return Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0))


def read_msg(f):
    """Read one module message (lines until single '.')."""
    lines = []
    while True:
        line = f.readline()
        if not line:
            return None
        if line.strip() == b".":
            return b"\n".join(lines).decode()
        lines.append(line.rstrip(b"\n"))


def test_module_commands(engine):
    srv = ModuleServer([engine], port=0)
    t = threading.Thread(target=lambda: (srv.accept(), srv.serve_forever()),
                         daemon=True)
    t.start()
    sock = socket.create_connection(("127.0.0.1", srv.port))
    f = sock.makefile("rb")

    sock.sendall(b"STATUS\n")
    assert 'PROCESS="ACTIVE"' in read_msg(f)
    sock.sendall(b"VERSION\n")
    assert "ENGINEINFO" in read_msg(f)
    sock.sendall(b"PAUSE\n")
    assert 'SLEEP' in read_msg(f)
    sock.sendall(b"STATUS\n")
    assert 'PROCESS="SLEEP"' in read_msg(f)
    sock.sendall(b"RESUME\n")
    assert 'ACTIVE' in read_msg(f)
    sock.sendall(b"LISTPROCESS\n")
    assert "PROCESSLIST" in read_msg(f)
    sock.sendall(b"DIE\n")
    t.join(timeout=5)
    assert not t.is_alive()
    sock.close()


def test_result_xml(engine):
    from julius_tpu.engine import Result
    r = Result(words=["<s>", "AB", "</s>"], texts=["", "ab", ""],
               word_ids=[0, 2, 1], score=-12.5, cm=[1.0, 0.9, 1.0])
    xml = result_to_xml(r)
    assert "<RECOGOUT>" in xml and 'WORD="ab"' in xml
    assert 'CM="0.900"' in xml
    bad = Result(valid=False)
    assert "RECOGFAIL" in result_to_xml(bad)


def test_adinnet_roundtrip():
    srv = AdinnetServer(port=0)
    got = {"samples": [], "segments": 0, "eos": False}

    def client():
        c = AdinnetClient(port=srv.port)
        c.send_samples(np.arange(1000, dtype=np.float32))
        c.send_segment_end()
        c.send_samples(np.ones(500, dtype=np.float32) * 7)
        c.close()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    srv.accept()
    for kind, payload in srv.events():
        if kind == "samples":
            got["samples"].append(payload)
        elif kind == "segment":
            got["segments"] += 1
        else:
            got["eos"] = True
            break
    srv.close()
    all_s = np.concatenate(got["samples"])
    assert got["segments"] == 1 and got["eos"]
    assert len(all_s) == 1500
    np.testing.assert_array_equal(all_s[:1000], np.arange(1000))


def test_serve_end_to_end(engine):
    """Full loop: adinnet audio in -> decode -> RECOGOUT on module."""
    mod = ModuleServer([engine], port=0)
    adin = AdinnetServer(port=0)

    def server_side():
        def run_module():
            mod.accept()
            mod.serve_forever()
        threading.Thread(target=run_module, daemon=True).start()
        adin.accept()
        from julius_tpu.streaming import StreamSession
        session = StreamSession(engine, use_vad=False)
        for kind, payload in adin.events():
            if kind == "samples":
                for r in session.feed(payload):
                    mod.send_result(r)
            elif kind in ("segment", "eos"):
                for r in session.close():
                    mod.send_result(r)
                if kind == "eos":
                    break
                session = StreamSession(engine, use_vad=False)
        adin.close()

    t = threading.Thread(target=server_side, daemon=True)
    t.start()

    ctl = socket.create_connection(("127.0.0.1", mod.port))
    f = ctl.makefile("rb")
    rng = np.random.default_rng(0)
    cli = AdinnetClient(port=adin.port)
    cli.send_samples((rng.standard_normal(12000) * 3000))
    cli.send_segment_end()
    msg = read_msg(f)
    assert msg is not None and ("<RECOGOUT>" in msg or "RECOGFAIL" in msg)
    cli.close()
    t.join(timeout=10)
    ctl.close()


@pytest.fixture(scope="module")
def grammar_engine():
    from julius_tpu.io.dfa import parse_dfa
    from fixtures import make_dfa_text
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "sil"), dim=4, n_states=3, n_mix=2))
    dfa = parse_dfa(io.StringIO(make_dfa_text()))
    voca = Vocabulary()
    for line in ["0\t[ab]\ta b", "1\t[ba]\tb a"]:
        parse_dict_line(line, voca)
    word_cat = np.asarray([0, 1], dtype=np.int32)
    return Engine(hmm, voca, dfa=dfa, word_cat=word_cat,
                  search=SearchConfig())


def test_module_grammar_and_process_commands(grammar_engine, tmp_path):
    """ADDGRAM/GRAMINFO/(DE)ACTIVATEGRAM/ADDWORD/SYNCGRAM + process cmds."""
    from fixtures import make_dfa_text
    srv = ModuleServer([grammar_engine], port=0)
    t = threading.Thread(target=lambda: (srv.accept(), srv.serve_forever()),
                         daemon=True)
    t.start()
    sock = socket.create_connection(("127.0.0.1", srv.port))
    f = sock.makefile("rb")

    # startup grammar registered as gid 0
    sock.sendall(b"GRAMINFO\n")
    info = read_msg(f)
    assert "#0:" in info and "[active]" in info

    # ADDGRAM with in-band dfa+dict body
    body = make_dfa_text() + "0\t[aa]\ta a\n1\t[bb]\tb b\nDICEND\n"
    sock.sendall(("ADDGRAM g2\n" + body).encode())
    msg = read_msg(f)
    assert 'STATUS="RECEIVED"' in msg and 'ID="1"' in msg
    # merged grammar now backs the engine: 4 words
    assert srv.engines[0].voca.n_words == 4

    # deactivate the new grammar -> back to 2 words
    sock.sendall(b"DEACTIVATEGRAM 1\n")
    assert 'READY' in read_msg(f)
    assert srv.engines[0].voca.n_words == 2
    sock.sendall(b"ACTIVATEGRAM 1\n")
    assert 'READY' in read_msg(f)
    assert srv.engines[0].voca.n_words == 4

    # ADDWORD to grammar 0
    sock.sendall(b"ADDWORD 0\n0\t[abab]\ta b a b\nDICEND\n")
    msg = read_msg(f)
    assert 'WORDADDED' in msg and 'NUM="1"' in msg
    assert srv.engines[0].voca.n_words == 5

    # DELGRAM the added grammar
    sock.sendall(b"DELGRAM 1\n")
    assert 'READY' in read_msg(f)
    assert srv.engines[0].voca.n_words == 3

    # process management
    sock.sendall(b"LISTPROCESS\n")
    assert 'STATUS="ACTIVE"' in read_msg(f)
    sock.sendall(b"DEACTIVATEPROCESS _default\n")
    assert 'OK' in read_msg(f)
    assert srv.process_active == [False]
    sock.sendall(b"ACTIVATEPROCESS _default\n")
    assert 'OK' in read_msg(f)
    sock.sendall(b"CURRENTPROCESS 0\n")
    assert 'ID="0"' in read_msg(f)
    sock.sendall(b"DIE\n")
    t.join(timeout=5)
    sock.close()
