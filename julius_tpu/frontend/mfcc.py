"""Batched HTK-compatible feature extraction in JAX.

Replaces the reference's per-frame C pipeline (libsent/src/wav2mfcc/
mfcc-core.c WMP_calc + wav2mfcc-buffer.c Wav2MFCC) with a whole-utterance,
whole-batch tensor program: framing is a strided gather, the FFT is XLA's
batched real FFT, the mel filterbank and DCT are matmuls on the MXU, and
delta/accel are fixed-width convolutions.  Numerics follow the reference
exactly (same mel spacing via the loChan/loWt construction mfcc-core.c:229,
same DCT/lifter constants, same energy normalisation NormaliseLogE and
CMN/MVN semantics from wav2mfcc-buffer.c).

All functions are jit-safe with static shapes; variable utterance lengths
are handled with a frame mask.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.config import FrontendConfig


# ---------------------------------------------------------------------------
# Host-side constant tables
# ---------------------------------------------------------------------------

@dataclass
class FrontendTables:
    """Precomputed constants (the MFCCWork equivalent, device-resident)."""

    window: np.ndarray     # [frame_size] hamming
    mel_w: np.ndarray      # [fft//2, fbank_num] filterbank weights
    dct_m: np.ndarray      # [fbank_num, mfcc_dim] DCT basis * sqrt(2/N)
    lifter: np.ndarray     # [mfcc_dim]
    c0_scale: float        # sqrt(2/N)
    cfg: FrontendConfig


def build_tables(cfg: FrontendConfig) -> FrontendTables:
    fs = cfg.frame_size
    nfft = cfg.fft_size
    nv2 = nfft // 2
    nchan = cfg.fbank_num

    window = (0.54 - 0.46 * np.cos(
        2.0 * np.pi * np.arange(fs) / (fs - 1))).astype(np.float32)

    # mel filterbank — reference InitFBank (mfcc-core.c:229): 1-based fft
    # "channel" k corresponds to fft bin k-1; fres converts bin to f/700.
    smp_period = 1.0e7 / cfg.sample_rate           # in 100ns units
    fres = 1.0e7 / (smp_period * nfft * 700.0)

    def mel_of(k):
        return 1127.0 * np.log(1.0 + (k - 1) * fres)

    klo, khi = 2, nv2
    mlo = 0.0
    mhi = mel_of(nv2 + 1)
    if cfg.lopass_hz >= 0:
        mlo = 1127.0 * np.log(1.0 + cfg.lopass_hz / 700.0)
        klo = int(cfg.lopass_hz * smp_period * 1.0e-7 * nfft + 2.5)
        klo = max(klo, 2)
    if cfg.hipass_hz >= 0:
        mhi = 1127.0 * np.log(1.0 + cfg.hipass_hz / 700.0)
        khi = int(cfg.hipass_hz * smp_period * 1.0e-7 * nfft + 0.5)
        khi = min(khi, nv2)

    maxchan = nchan + 1
    cf = np.zeros(maxchan + 1)
    for chan in range(1, maxchan + 1):
        cf[chan] = (chan / maxchan) * (mhi - mlo) + mlo
    if cfg.vtln_alpha != 1.0:
        cf = _vtln_warp(cf, cfg, mlo, mhi, maxchan)

    mel_w = np.zeros((nv2, nchan), dtype=np.float32)
    chan = 1
    for k in range(1, nv2 + 1):
        if k < klo or k > khi:
            continue
        melk = mel_of(k)
        while chan <= maxchan and cf[chan] < melk:
            chan += 1
        lo = chan - 1
        if lo > 0:
            lowt = (cf[lo + 1] - melk) / (cf[lo + 1] - cf[lo])
        else:
            lowt = (cf[1] - melk) / (cf[1] - mlo)
        # bin index in fft array is k-1; fbank channels are 1-based
        if lo > 0:
            mel_w[k - 1, lo - 1] += lowt
        if lo < nchan:
            mel_w[k - 1, lo] += 1.0 - lowt

    # DCT basis (reference MakeMFCC)
    sqrt2var = math.sqrt(2.0 / nchan)
    j = np.arange(1, nchan + 1)
    i = np.arange(1, cfg.mfcc_dim + 1)
    dct_m = (np.cos(np.pi * np.outer(j - 0.5, i) / nchan)
             * sqrt2var).astype(np.float32)

    lifter = (1.0 + (cfg.lifter / 2.0) * np.sin(
        np.pi * np.arange(1, cfg.mfcc_dim + 1) / cfg.lifter)).astype(np.float32)

    return FrontendTables(window=window, mel_w=mel_w, dct_m=dct_m,
                          lifter=lifter, c0_scale=sqrt2var, cfg=cfg)


def _vtln_warp(cf, cfg, mlo, mhi, maxchan):
    """VTLN piecewise-linear warp of filterbank centres
    (reference VTLN_recreate_fbank_cf mfcc-core.c:177)."""
    minf = 700.0 * (np.exp(mlo / 1127.0) - 1.0)
    maxf = 700.0 * (np.exp(mhi / 1127.0) - 1.0)
    upper = cfg.vtln_upper if cfg.vtln_upper > 0 else maxf * 0.9
    scale = 1.0 / cfg.vtln_alpha
    cu = upper * 2 / (1 + scale)
    cl = cfg.vtln_lower * 2 / (1 + scale)
    au = (maxf - cu * scale) / (maxf - cu)
    al = (cl * scale - minf) / (cl - minf)
    out = cf.copy()
    for chan in range(1, maxchan + 1):
        f = 700.0 * (np.exp(cf[chan] / 1127.0) - 1.0)
        if f > cu:
            fn = au * (f - cu) + scale * cu
        elif f < cl:
            fn = al * (f - minf) + minf
        else:
            fn = scale * f
        out[chan] = 1127.0 * np.log(1.0 + fn / 700.0)
    return out


def num_frames(n_samples: int, cfg: FrontendConfig) -> int:
    if n_samples < cfg.frame_size:
        return 0
    return (n_samples - cfg.frame_size) // cfg.frame_shift + 1


# ---------------------------------------------------------------------------
# Device pipeline
# ---------------------------------------------------------------------------

def _frame_signal(wave: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """[B, L] -> [B, T, frame_size] strided windows."""
    B, L = wave.shape
    T = num_frames(L, cfg)
    idx = (jnp.arange(T)[:, None] * cfg.frame_shift
           + jnp.arange(cfg.frame_size)[None, :])
    return wave[:, idx]


def extract_basic(
    wave: jnp.ndarray,
    tables: FrontendTables,
    noise_spectrum: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Static features for a batch of waveforms: [B, L] -> [B, T, baselen].

    Layout per frame: [cepstra (mfcc_dim) | c0? | energy?] — matching the
    reference WMP_calc output ordering (mfcc-core.c:716-722)."""
    cfg = tables.cfg
    frames = _frame_signal(wave, cfg)                 # [B, T, F]

    if cfg.zmeanframe:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    raw_energy = jnp.log(jnp.maximum(
        jnp.sum(frames * frames, axis=-1), 1e-10))

    # pre-emphasis within frame (reference PreEmphasise: first sample
    # scaled by (1 - k), rest get the running difference)
    k = cfg.preemph
    pre = jnp.concatenate(
        [frames[..., :1] * (1.0 - k),
         frames[..., 1:] - k * frames[..., :-1]], axis=-1)

    windowed = pre * jnp.asarray(tables.window)
    win_energy = jnp.log(jnp.maximum(
        jnp.sum(windowed * windowed, axis=-1), 1e-10))
    energy = raw_energy if cfg.raw_e else win_energy

    nfft = cfg.fft_size
    spec = jnp.fft.rfft(windowed, n=nfft, axis=-1)    # [B, T, nfft/2+1]
    mag = jnp.abs(spec)[..., : nfft // 2]             # bins 0..nv2-1

    if noise_spectrum is not None or cfg.sscalc_frames > 0:
        # spectral subtraction (reference ss in MakeFBank / ss.c:111);
        # -sscalc estimates the noise power per utterance from the head
        # frames of the input itself (reference sscalc path,
        # realtime-1stpass.c new_SS_calculate role)
        p2 = mag * mag
        if noise_spectrum is not None:
            np2 = noise_spectrum[: nfft // 2] ** 2
        else:
            k = cfg.sscalc_frames
            np2 = jnp.mean(p2[:, :k], axis=1, keepdims=True)
        sub = p2 - cfg.ss_alpha * np2
        mag = jnp.where(sub < 0, cfg.ss_floor * mag, jnp.sqrt(jnp.maximum(sub, 0)))

    if cfg.use_power:
        mag = mag * mag

    # full f32 precision: the front-end is tiny FLOPs but feeds everything
    # downstream, and WER parity needs exact cepstra
    fbank = jnp.matmul(mag, jnp.asarray(tables.mel_w),
                       precision=jax.lax.Precision.HIGHEST)  # [B, T, nchan]

    base = (cfg.feature_type or "MFCC").split("_")[0].upper()
    if base in ("FBANK", "MELSPEC"):
        # FBANK/MELSPEC use all channels directly (reference fbank_only path)
        feats = jnp.log(jnp.maximum(fbank, 1.0)) if base == "FBANK" else fbank
        parts = [feats]
        if cfg.use_energy:
            parts.append(energy[..., None])
        return jnp.concatenate(parts, axis=-1)

    logfb = jnp.log(jnp.maximum(fbank, 1.0))
    cep = jnp.matmul(logfb, jnp.asarray(tables.dct_m),
                     precision=jax.lax.Precision.HIGHEST)  # [B, T, mfcc_dim]
    cep = cep * jnp.asarray(tables.lifter)
    parts = [cep]
    if cfg.use_c0:
        parts.append(jnp.sum(logfb, axis=-1, keepdims=True) * tables.c0_scale)
    if cfg.use_energy:
        parts.append(energy[..., None])
    return jnp.concatenate(parts, axis=-1)


def _normalise_log_energy(feats: jnp.ndarray, mask: jnp.ndarray,
                          cfg: FrontendConfig) -> jnp.ndarray:
    """Reference NormaliseLogE (wav2mfcc-buffer.c:110): floor at
    max - silFloor*ln10/10, rescale to 1.0 - (max - E) * escale."""
    eidx = cfg.base_dim - 1
    e = feats[..., eidx]
    emax = jnp.max(jnp.where(mask, e, -jnp.inf), axis=-1, keepdims=True)
    emin = emax - (cfg.silfloor_db * math.log(10.0)) / 10.0
    e = jnp.maximum(e, emin)
    e = 1.0 - (emax - e) * cfg.escale
    return feats.at[..., eidx].set(e)


def _delta_block(x: jnp.ndarray, mask: jnp.ndarray, win: int) -> jnp.ndarray:
    """HTK delta regression over time with edge replication
    (reference Delta wav2mfcc-buffer.c / WMP_deltabuf_calc).

    x: [B, T, D]; mask: [B, T] valid-frame mask.  Edge replication must
    respect per-utterance length, so indices are clamped to [0, len-1]."""
    B, T, D = x.shape
    lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)      # [B]
    t = jnp.arange(T)
    num = jnp.zeros_like(x)
    denom = 2.0 * sum(th * th for th in range(1, win + 1))
    for th in range(1, win + 1):
        ip = jnp.minimum(t + th, jnp.maximum(lengths - 1, 0)[:, None])  # [B,T]
        im = jnp.maximum(t - th, 0)                                     # [T]
        xp = jnp.take_along_axis(x, ip[..., None], axis=1)
        xm = x[:, im, :]
        num = num + th * (xp - xm)
    return num / denom


def extract_features(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    tables: FrontendTables,
    cmn_mean: Optional[jnp.ndarray] = None,
    cvn_var: Optional[jnp.ndarray] = None,
    noise_spectrum: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full batched front-end: [B, L] waveforms (+ sample lengths [B]) ->
    ([B, T, veclen] features, [B, T] frame mask).

    Batch-mode CMN/CVN over each utterance (reference Wav2MFCC
    wav2mfcc-buffer.c:57); pass cmn_mean/cvn_var for static normalisation
    (-cmnstatic semantics)."""
    cfg = tables.cfg
    feats = extract_basic(wave, tables, noise_spectrum)      # [B, T, baselen]
    B, T, _ = feats.shape
    nfr = jnp.where(lengths >= cfg.frame_size,
                    (lengths - cfg.frame_size) // cfg.frame_shift + 1, 0)
    mask = jnp.arange(T)[None, :] < nfr[:, None]

    if cfg.use_energy and cfg.energy_normalize:
        feats = _normalise_log_energy(feats, mask, cfg)

    blocks = [feats]
    if cfg.use_delta:
        d = _delta_block(feats, mask, cfg.delta_win)
        if cfg.absesup:
            # static energy dropped; delta block keeps its own energy
            # (reference Delta's absesup slot shift)
            blocks = [feats[..., :-1], d]
        else:
            blocks = [feats, d]
        if cfg.use_accel:
            blocks.append(_delta_block(d, mask, cfg.accel_win))
    out = jnp.concatenate(blocks, axis=-1)

    # CMN / CVN (reference CMN/MVN wav2mfcc-buffer.c): mean over static
    # cepstra (+c0) only; variance over the full vector.
    basedim = cfg.mfcc_dim + (1 if cfg.use_c0 else 0)
    fmask = mask[..., None]
    denom = jnp.maximum(jnp.sum(fmask, axis=1), 1)
    if cfg.cmn:
        if cmn_mean is not None:
            mean = cmn_mean[None, None, :basedim]
        else:
            mean = (jnp.sum(jnp.where(fmask, out, 0.0), axis=1, keepdims=True)
                    / denom[:, None])[..., :basedim]
        out = out.at[..., :basedim].add(
            jnp.broadcast_to(-mean, out[..., :basedim].shape))
    if cfg.cvn:
        if cvn_var is not None:
            sd = jnp.sqrt(jnp.maximum(cvn_var, 1e-10))[None, None, :]
        else:
            m = (jnp.sum(jnp.where(fmask, out, 0.0), axis=1, keepdims=True)
                 / denom[:, None])
            v = (jnp.sum(jnp.where(fmask, (out - m) ** 2, 0.0), axis=1,
                         keepdims=True) / denom[:, None])
            sd = jnp.sqrt(jnp.maximum(v, 1e-10))
        out = out / sd
    out = jnp.where(fmask, out, 0.0)
    return out, mask


def splice_frames(feats: jnp.ndarray, mask: jnp.ndarray,
                  context_len: int) -> jnp.ndarray:
    """DNN input splicing: stack `context_len` consecutive frames centred on
    each frame, replicating edges within the valid region (reference
    RealTimeMFCC splice / calc_dnn input windowing).
    [B, T, D] -> [B, T, D * context_len]."""
    B, T, D = feats.shape
    half = context_len // 2
    lengths = jnp.maximum(jnp.sum(mask.astype(jnp.int32), axis=-1), 1)
    t = jnp.arange(T)
    cols = []
    for off in range(-half, context_len - half):
        it = jnp.clip(t + off, 0, (lengths - 1)[:, None])
        cols.append(jnp.take_along_axis(feats, it[..., None], axis=1))
    return jnp.concatenate(cols, axis=-1)
