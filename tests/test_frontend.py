"""Front-end tests: batched JAX pipeline vs independent NumPy golden."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp  # noqa: E402

from julius_tpu.config import FrontendConfig, parse_feature_type  # noqa: E402
from julius_tpu.frontend.mfcc import (  # noqa: E402
    build_tables, extract_basic, extract_features, num_frames, splice_frames,
)
from ref_frontend import full_pipeline  # noqa: E402


def _wave(n=4000, seed=0, rate=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = (3000 * np.sin(2 * np.pi * 440 * t)
         + 1500 * np.sin(2 * np.pi * 1330 * t + 0.5)
         + 200 * rng.standard_normal(n))
    return x.astype(np.float32)


class TestTables:
    def test_mel_filter_partition(self):
        cfg = FrontendConfig()
        tb = build_tables(cfg)
        # each fft bin's weights sum to <= 1 and bins in the passband
        # fully distribute between two adjacent channels
        sums = tb.mel_w.sum(axis=1)
        assert np.all(sums <= 1.0 + 1e-5)
        assert tb.mel_w.shape == (cfg.fft_size // 2, cfg.fbank_num)
        # middle of the band: every bin covered
        mid = slice(10, cfg.fft_size // 4)
        assert np.all(sums[mid] > 0.0)

    def test_veclen(self):
        cfg = parse_feature_type("MFCC_E_D_N_Z")
        assert cfg.base_dim == 13
        assert cfg.veclen == 25
        cfg = parse_feature_type("MFCC_E_D_A_Z")
        assert cfg.veclen == 39
        cfg = parse_feature_type("MFCC_0_Z")
        assert cfg.veclen == 13


class TestAgainstGolden:
    @pytest.mark.parametrize("ftype", [
        "MFCC_E", "MFCC_E_D", "MFCC_E_D_A", "MFCC_E_D_N_Z", "MFCC_0_D_Z",
    ])
    def test_matches_numpy(self, ftype):
        cfg = parse_feature_type(ftype)
        golden = full_pipeline(_wave(), cfg)
        tb = build_tables(cfg)
        wave = jnp.asarray(_wave())[None, :]
        feats, mask = extract_features(
            wave, jnp.asarray([wave.shape[1]]), tb)
        got = np.asarray(feats[0])
        assert got.shape == golden.shape
        assert bool(np.all(np.asarray(mask[0])))
        np.testing.assert_allclose(got, golden, rtol=2e-3, atol=2e-3)

    def test_enormal(self):
        cfg = parse_feature_type("MFCC_E_D_Z")
        cfg.energy_normalize = True
        cfg.escale = 0.1
        golden = full_pipeline(_wave(), cfg)
        tb = build_tables(cfg)
        wave = jnp.asarray(_wave())[None, :]
        feats, _ = extract_features(wave, jnp.asarray([wave.shape[1]]), tb)
        np.testing.assert_allclose(np.asarray(feats[0]), golden,
                                   rtol=2e-3, atol=2e-3)

    def test_fbank(self):
        cfg = parse_feature_type("FBANK_D_A_Z")
        cfg.fbank_num = 40
        golden = full_pipeline(_wave(), cfg)
        tb = build_tables(cfg)
        wave = jnp.asarray(_wave())[None, :]
        feats, _ = extract_features(wave, jnp.asarray([wave.shape[1]]), tb)
        got = np.asarray(feats[0])
        assert got.shape[1] == 120
        np.testing.assert_allclose(got, golden, rtol=2e-3, atol=2e-3)

    def test_cvn(self):
        cfg = parse_feature_type("MFCC_E_Z")
        cfg.cvn = True
        golden = full_pipeline(_wave(), cfg)
        tb = build_tables(cfg)
        wave = jnp.asarray(_wave())[None, :]
        feats, _ = extract_features(wave, jnp.asarray([wave.shape[1]]), tb)
        np.testing.assert_allclose(np.asarray(feats[0]), golden,
                                   rtol=5e-3, atol=5e-3)


class TestBatching:
    def test_variable_lengths_masked(self):
        cfg = parse_feature_type("MFCC_E_D_Z")
        tb = build_tables(cfg)
        w1 = _wave(4000, seed=1)
        w2 = _wave(2500, seed=2)
        batch = np.zeros((2, 4000), np.float32)
        batch[0] = w1
        batch[1, :2500] = w2
        feats, mask = extract_features(
            jnp.asarray(batch), jnp.asarray([4000, 2500]), tb)
        t2 = num_frames(2500, cfg)
        assert int(mask[1].sum()) == t2
        # short utterance must match its solo extraction (CMN over its
        # own frames only, delta edge replication at its own end)
        solo, _ = extract_features(
            jnp.asarray(w2)[None, :], jnp.asarray([2500]), tb)
        np.testing.assert_allclose(
            np.asarray(feats[1, :t2]), np.asarray(solo[0, :t2]),
            rtol=1e-4, atol=1e-4)
        # masked region zeroed
        assert np.all(np.asarray(feats[1, t2:]) == 0.0)

    def test_splice(self):
        cfg = parse_feature_type("MFCC_E")
        tb = build_tables(cfg)
        wave = jnp.asarray(_wave())[None, :]
        feats, mask = extract_features(wave, jnp.asarray([wave.shape[1]]), tb)
        sp = splice_frames(feats, mask, 5)
        T, D = feats.shape[1], feats.shape[2]
        assert sp.shape == (1, T, D * 5)
        # centre block equals the frame itself
        np.testing.assert_allclose(np.asarray(sp[0, :, 2 * D: 3 * D]),
                                   np.asarray(feats[0]), rtol=1e-6)
        # first frame's left context replicated
        np.testing.assert_allclose(np.asarray(sp[0, 0, :D]),
                                   np.asarray(feats[0, 0]), rtol=1e-6)
