"""Binary HMM round-trip tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import FrontendConfig
from julius_tpu.io.binhmm import read_binhmm, write_binhmm
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.ops.gmm import build_gmm_tables, senone_scores

from fixtures import make_hmmdefs_text


def test_binhmm_roundtrip_scores(tmp_path):
    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=8, n_states=3, n_mix=3))
    p = str(tmp_path / "am.binhmm")
    write_binhmm(p, hmm)
    hmm2, para = read_binhmm(p)
    assert para is None
    assert hmm2.phone_names == hmm.phone_names
    assert hmm2.n_states == hmm.n_states
    assert hmm2.n_gauss == hmm.n_gauss
    np.testing.assert_array_equal(hmm2.phone_states, hmm.phone_states)
    np.testing.assert_allclose(hmm2.phone_trans, hmm.phone_trans,
                               rtol=1e-4, atol=1e-3)
    # the real equivalence check: identical senone scores
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, hmm.dim)).astype(np.float32)
    s1 = np.asarray(senone_scores(build_gmm_tables(hmm), jnp.asarray(x)))
    s2 = np.asarray(senone_scores(build_gmm_tables(hmm2), jnp.asarray(x)))
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-3)


def test_binhmm_embedded_para(tmp_path):
    hmm = parse_hmmdefs_text(make_hmmdefs_text(dim=26))
    cfg = FrontendConfig(sample_rate=16000, fbank_num=24, mfcc_dim=12,
                         use_energy=True, use_delta=True, cmn=True)
    cfg.feature_type = "MFCC_E_D_Z"
    p = str(tmp_path / "am.binhmm")
    write_binhmm(p, hmm, para=cfg)
    hmm2, para = read_binhmm(p)
    assert para is not None
    assert para.sample_rate == 16000
    assert para.fbank_num == 24
    assert para.frame_size == cfg.frame_size
    assert para.frame_shift == cfg.frame_shift
    assert para.use_energy and para.use_delta and para.cmn
    assert not para.use_accel and not para.use_c0
    assert para.mfcc_dim == 12
    assert para.veclen == 26


def test_binhmm_rejects_garbage(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"JUNKJUNK\x00" * 20)
    with pytest.raises(ValueError):
        read_binhmm(str(p))
