"""vecnet protocol + outprob input/dump tests."""

import io
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.server.vecnet import VecnetClient, VecnetServer

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
    eng = Engine(hmm, voca, lm, search=SearchConfig(lm_weight=2.0))
    name2id = {n: i for i, n in enumerate(voca.names)}
    truth = ["<s>", "BA", "AB", "</s>"]
    rng = np.random.default_rng(0)
    pids = [hmm.phone_index[p] for w in truth
            for p in voca.phones[name2id[w]]]
    frames, _ = sample_states_and_frames(hmm, pids, rng)
    return eng, frames, truth


def test_vecnet_feature_roundtrip(setup):
    eng, frames, truth = setup
    srv = VecnetServer(port=0)

    def client():
        c = VecnetClient(veclen=frames.shape[1], port=srv.port)
        c.send_frames(frames)
        c.send_segment_end()
        c.close()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    srv.accept()
    assert srv.veclen == frames.shape[1]
    assert not srv.is_outprob
    got = []
    for kind, vec in srv.events():
        if kind == "vector":
            got.append(vec)
        else:
            break
    srv.close()
    got = np.stack(got)
    np.testing.assert_allclose(got, frames, rtol=1e-6)
    # decode received frames end-to-end
    r = eng.decode_features(jnp.asarray(got[None]),
                            jnp.asarray([got.shape[0]]))[0]
    assert r.words == truth


def test_outprob_dump_and_replay(setup):
    """compute_outprob -> decode_outprob must reproduce the transcript
    (reference -outprobout + SP_OUTPROBFILE round trip)."""
    eng, frames, truth = setup
    rows = eng.compute_outprob(jnp.asarray(frames[None]))
    assert rows.shape[-1] == eng.hmm.n_states
    r = eng.decode_outprob(rows, np.asarray([frames.shape[0]]))[0]
    assert r.valid
    assert r.words == truth
    # score parity with the feature path
    r2 = eng.decode_features(jnp.asarray(frames[None]),
                             jnp.asarray([frames.shape[0]]))[0]
    assert abs(r.score - r2.score) < 1e-3
