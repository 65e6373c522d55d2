"""Independent per-frame NumPy implementation of the HTK feature pipeline,
used as the golden reference for the batched JAX front-end.  Mirrors the
algorithm of reference WMP_calc (mfcc-core.c) step by step with float64."""

import numpy as np

from julius_tpu.frontend.mfcc import build_tables


def frame_mfcc(frame, tables):
    """One frame of samples -> static feature vector (float64)."""
    cfg = tables.cfg
    x = frame.astype(np.float64).copy()
    if cfg.zmeanframe:
        x -= x.mean()
    raw_e = np.log(max(np.sum(x * x), 1e-10))
    # pre-emphasis (in-place, back to front)
    for i in range(len(x) - 1, 0, -1):
        x[i] -= x[i - 1] * cfg.preemph
    x[0] *= 1.0 - cfg.preemph
    n = len(x)
    x *= 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    win_e = np.log(max(np.sum(x * x), 1e-10))
    nfft = cfg.fft_size
    spec = np.fft.rfft(x, n=nfft)
    mag = np.abs(spec)[: nfft // 2]
    if cfg.use_power:
        mag = mag * mag
    fbank = mag @ tables.mel_w.astype(np.float64)
    base = (cfg.feature_type or "MFCC").split("_")[0].upper()
    if base in ("FBANK", "MELSPEC"):
        feats = np.log(np.maximum(fbank, 1.0)) if base == "FBANK" else fbank
        out = list(feats)
    else:
        logfb = np.log(np.maximum(fbank, 1.0))
        cep = logfb @ tables.dct_m.astype(np.float64)
        cep *= tables.lifter.astype(np.float64)
        out = list(cep)
        if cfg.use_c0:
            out.append(np.sum(logfb) * tables.c0_scale)
    if cfg.use_energy:
        out.append(raw_e if cfg.raw_e else win_e)
    return np.asarray(out)


def full_pipeline(wave, cfg):
    """Whole utterance: framing, statics, enormal, delta/accel, CMN/CVN."""
    tables = build_tables(cfg)
    fs, sh = cfg.frame_size, cfg.frame_shift
    T = (len(wave) - fs) // sh + 1
    feats = np.stack([
        frame_mfcc(wave[t * sh: t * sh + fs], tables) for t in range(T)])
    if cfg.use_energy and cfg.energy_normalize:
        eidx = cfg.base_dim - 1
        e = feats[:, eidx]
        emax = e.max()
        emin = emax - (cfg.silfloor_db * np.log(10.0)) / 10.0
        e = np.maximum(e, emin)
        feats[:, eidx] = 1.0 - (emax - e) * cfg.escale

    def delta(x, win):
        B = 2.0 * sum(th * th for th in range(1, win + 1))
        out = np.zeros_like(x)
        for t in range(len(x)):
            for th in range(1, win + 1):
                a1 = x[max(t - th, 0)]
                a2 = x[min(t + th, len(x) - 1)]
                out[t] += th * (a2 - a1)
        return out / B

    blocks = [feats]
    if cfg.use_delta:
        d = delta(feats, cfg.delta_win)
        blocks = [feats[:, :-1], d] if cfg.absesup else [feats, d]
        if cfg.use_accel:
            blocks.append(delta(d, cfg.accel_win))
    out = np.concatenate(blocks, axis=1)

    basedim = cfg.mfcc_dim + (1 if cfg.use_c0 else 0)
    if cfg.cmn:
        out[:, :basedim] -= out[:, :basedim].mean(axis=0)
    if cfg.cvn:
        sd = out.std(axis=0)
        out /= np.maximum(sd, 1e-5)
    return out
