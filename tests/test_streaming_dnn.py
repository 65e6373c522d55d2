"""Streaming decode with a DNN engine (exercises the splice-lag path)."""

import io

import numpy as np
import pytest

from julius_tpu.config import FrontendConfig, SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.dnn import DNNParams
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.streaming import StreamSession

from fixtures import make_arpa_text, make_dict_text, make_hmmdefs_text


@pytest.fixture(scope="module")
def dnn_engine():
    # GMM structure defines states; a small random DNN provides scores
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "sil"), dim=26, n_states=3, n_mix=1))
    voca = Vocabulary()
    for line in make_dict_text([("<s>", "[]", ["sil"]),
                                ("</s>", "[]", ["sil"]),
                                ("AB", "[ab]", ["a", "b"])]).splitlines():
        parse_dict_line(line, voca)
    lm = parse_arpa(io.StringIO(make_arpa_text()))
    rng = np.random.default_rng(0)
    ctx = 5
    din = 26 * ctx
    S = hmm.n_states
    dnn = DNNParams(
        weights=[(rng.standard_normal((din, 32)) * 0.1).astype(np.float32)],
        biases=[np.zeros(32, dtype=np.float32)],
        output_w=(rng.standard_normal((32, S)) * 0.1).astype(np.float32),
        output_b=np.zeros(S, dtype=np.float32),
        log_prior=np.full(S, np.log10(1.0 / S), dtype=np.float32),
        context_len=ctx,
        feature_len=26,
    )
    return Engine(hmm, voca, lm, dnn=dnn,
                  frontend=FrontendConfig(cmn=False),
                  search=SearchConfig(lm_weight=2.0))


def test_dnn_stream_matches_batch(dnn_engine):
    eng = dnn_engine
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(12000) * 3000).astype(np.float32)
    batch_res = eng.recognize_batch(wave[None], np.asarray([len(wave)]))[0]

    sess = StreamSession(eng, use_vad=False, block_frames=8)
    outs = []
    for ofs in range(0, len(wave), 1500):
        outs.extend(sess.feed(wave[ofs: ofs + 1500]))
    outs.extend(sess.close())
    assert len(outs) == 1
    assert outs[0].words == batch_res.words
    assert abs(outs[0].score - batch_res.score) < 1.0
