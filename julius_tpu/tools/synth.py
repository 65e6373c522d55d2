"""Synthetic model builders at realistic scale.

Used by bench.py and __graft_entry__.py to exercise the flagship
DNN-HMM LVCSR configuration (ENVR-v5.4-like: 40ch FBANK_D_A front-end,
11-frame splice, 5x2048 sigmoid hidden layers, ~2k senones — reference
README.md Quick Run model + Sample.dnnconf) without shipping model files.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from julius_tpu.config import FrontendConfig, SearchConfig, parse_feature_type
from julius_tpu.io.arpa import NGramLM
from julius_tpu.io.dnn import DNNParams
from julius_tpu.io.htk_dict import Vocabulary
from julius_tpu.models.hmm import HMMSet
from julius_tpu.utils.logadd import LOG_ZERO


def make_hmmset(n_phones: int = 668, n_states: int = 3, dim: int = 120,
                n_mix: int = 1, seed: int = 0) -> HMMSet:
    """HMMSet with P phones x n_states unique senones, strict L2R."""
    rng = np.random.default_rng(seed)
    S = n_phones * n_states
    G = S * n_mix
    means = rng.standard_normal((G, dim)).astype(np.float32)
    ivars = (1.0 / (0.5 + rng.random((G, dim)))).astype(np.float32)
    gconst = (dim * math.log(2 * math.pi)
              - np.sum(np.log(ivars), axis=1)).astype(np.float32)
    state_mix = np.arange(S, dtype=np.int32).reshape(S, 1) * n_mix \
        + np.arange(n_mix, dtype=np.int32)[None, :]
    state_lw = np.full((S, n_mix), -math.log(n_mix), dtype=np.float32)
    phone_states = np.arange(S, dtype=np.int32).reshape(n_phones, n_states)
    phone_ns = np.full(n_phones, n_states, dtype=np.int32)
    N = n_states + 2
    trans = np.full((N, N), LOG_ZERO, dtype=np.float32)
    trans[0, 1] = 0.0
    for s in range(1, N - 1):
        trans[s, s] = math.log(0.6)
        trans[s, s + 1] = math.log(0.4)
    phone_trans = np.tile(trans[None], (n_phones, 1, 1))
    names = [f"p{i:03d}" for i in range(n_phones - 1)] + ["sil"]
    return HMMSet(
        means=means, ivars=ivars, gconst=gconst,
        state_mix=state_mix, state_lw=state_lw,
        state_sid=np.arange(S, dtype=np.int32),
        phone_states=phone_states, phone_ns=phone_ns,
        phone_trans=phone_trans,
        phone_names=names,
        phone_index={n: i for i, n in enumerate(names)},
        logical_map={},
        veclen=dim,
        names_are_triphone=False,
    )


def make_vocabulary(hmm: HMMSet, n_words: int = 5000,
                    min_phones: int = 3, max_phones: int = 7,
                    seed: int = 1) -> Vocabulary:
    rng = np.random.default_rng(seed)
    usable = [n for n in hmm.phone_names if n != "sil"]
    voca = Vocabulary()
    voca.add("<s>", ["sil"])
    voca.add("</s>", ["sil"])
    for i in range(n_words - 2):
        k = int(rng.integers(min_phones, max_phones + 1))
        phones = [usable[int(j)] for j in
                  rng.integers(0, len(usable), size=k)]
        voca.add(f"w{i:05d}", phones)
    return voca


def make_ngram(voca: Vocabulary, n_bigrams_per_word: int = 12,
               seed: int = 2) -> NGramLM:
    rng = np.random.default_rng(seed)
    words = list(voca.names)
    V = len(words)
    uni = {}
    for i in range(V):
        uni[(i,)] = (float(-1.0 - 3.0 * rng.random()), -0.4)
    bi = {}
    for v in range(V):
        tgt = rng.integers(0, V, size=n_bigrams_per_word)
        for w in tgt:
            bi[(v, int(w))] = (float(-0.5 - 2.0 * rng.random()), 0.0)
    return NGramLM(
        order=2, words=words,
        word_index={w: i for i, w in enumerate(words)},
        ngrams=[uni, bi],
        bos_id=0, eos_id=1,
    )


def make_dnn(dim_in: int = 1320, hidden: int = 2048, n_layers: int = 5,
             n_out: int = 2004, seed: int = 3) -> DNNParams:
    rng = np.random.default_rng(seed)

    def mat(a, b):
        return (rng.standard_normal((a, b)) / math.sqrt(a)).astype(np.float32)

    weights = [mat(dim_in, hidden)] + [
        mat(hidden, hidden) for _ in range(n_layers - 1)]
    biases = [np.zeros(hidden, dtype=np.float32) for _ in range(n_layers)]
    return DNNParams(
        weights=weights,
        biases=biases,
        output_w=mat(hidden, n_out),
        output_b=np.zeros(n_out, dtype=np.float32),
        log_prior=np.full(n_out, math.log10(1.0 / n_out), dtype=np.float32),
        context_len=11,
        feature_len=dim_in // 11,
    )


def flagship_engine(n_words: int = 5000, n_phones: int = 668,
                    hidden: int = 2048, n_layers: int = 5,
                    seed: int = 0):
    """The headline configuration: DNN-HMM dictation, FBANK_D_A 40ch."""
    from julius_tpu.engine import Engine

    fe_cfg = parse_feature_type("FBANK_D_A")
    fe_cfg.fbank_num = 40
    feat_dim = 120          # 40 static + 40 delta + 40 accel
    hmm = make_hmmset(n_phones=n_phones, dim=feat_dim, seed=seed)
    voca = make_vocabulary(hmm, n_words=n_words, seed=seed + 1)
    lm = make_ngram(voca, seed=seed + 2)
    dnn = make_dnn(dim_in=feat_dim * 11, hidden=hidden, n_layers=n_layers,
                   n_out=hmm.n_states, seed=seed + 3)
    return Engine(hmm, voca, lm, dnn=dnn, frontend=fe_cfg,
                  search=SearchConfig(lm_weight=8.0, lm_penalty=-2.0,
                                      trellis_topm=32))
