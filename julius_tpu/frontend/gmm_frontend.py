"""GMM front-end: utterance verification, rejection, and GMM-VAD.

Reference: `libjulius/src/gmm.c` — gmm_init:429, per-frame
gmm_proceed:574 (accumulating frame log-likelihoods per model),
gmm_end:657 (argmax model -> accept/reject via -gmmreject), and the
GMM_VAD variant (sliding window of frame-wise voice/noise margins with
up/down triggers).

TPU design: the GMM set is scored for all models x all frames in one
dense call (ops/gmm.py); accumulation, argmax and the VAD margin are
trivial reductions.  Each model contributes its best state per frame
(the reference's models are 1-state, where this is identical).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.models.hmm import HMMSet
from julius_tpu.ops.gmm import build_gmm_tables, senone_scores
from julius_tpu.utils.logadd import LOG_ZERO


@dataclass
class GMMResult:
    """Per-utterance verification outcome (reference gmm_end)."""

    best_name: str
    scores: dict                 # model name -> accumulated log-lh
    accepted: bool


class GMMFrontend:
    """Utterance verification GMM (-gmm / -gmmreject / -gmmnum)."""

    def __init__(self, hmm: HMMSet, reject_names: Sequence[str] = (),
                 vad_noise_names: Sequence[str] = (),
                 vad_margin: float = 0.7, vad_up: float = 2.0,
                 vad_down: float = -0.2):
        self.hmm = hmm
        self.tables = build_gmm_tables(hmm)
        self.names = list(hmm.phone_names)
        self.reject = set(reject_names)
        # model m uses its states' senone rows
        P = hmm.n_phones
        S = hmm.n_states
        mask = np.full((P, S), False)
        for p in range(P):
            for j in range(int(hmm.phone_ns[p])):
                mask[p, int(hmm.phone_states[p, j])] = True
        self._mask = jnp.asarray(mask)
        noise = np.asarray([n in set(vad_noise_names)
                            for n in self.names])
        self._noise = jnp.asarray(noise)
        self.vad_margin = vad_margin
        self.vad_up = vad_up
        self.vad_down = vad_down
        self._frame_fn = jax.jit(self._frame_scores)

    def _frame_scores(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[T, D] -> [T, P] per-model frame log-likelihood (max over the
        model's states; identical to the reference for 1-state GMMs)."""
        s = senone_scores(self.tables, feats)            # [T, S]
        per_model = jnp.where(self._mask[None], s[:, None, :], LOG_ZERO)
        return jnp.max(per_model, axis=-1)               # [T, P]

    def verify(self, feats: np.ndarray,
               n_frames: Optional[int] = None) -> GMMResult:
        """Whole-utterance verification (gmm_proceed accumulation +
        gmm_end decision)."""
        fs = np.asarray(self._frame_fn(jnp.asarray(feats)))
        if n_frames is not None:
            fs = fs[:n_frames]
        total = fs.sum(axis=0)
        best = int(np.argmax(total))
        name = self.names[best]
        return GMMResult(
            best_name=name,
            scores={n: float(t) for n, t in zip(self.names, total)},
            accepted=name not in self.reject,
        )

    def frame_margins(self, feats: np.ndarray) -> np.ndarray:
        """GMM_VAD frame scores: max(voice) - max(noise) per frame
        (reference gmm_proceed GMM_VAD block)."""
        fs = np.asarray(self._frame_fn(jnp.asarray(feats)))
        noise = np.asarray(self._noise)
        if not noise.any() or noise.all():
            return np.zeros(fs.shape[0], dtype=np.float32)
        vmax = fs[:, ~noise].max(axis=1)
        nmax = fs[:, noise].max(axis=1)
        return (vmax - nmax).astype(np.float32)

    def vad_decisions(self, feats: np.ndarray,
                      window: int = 5) -> np.ndarray:
        """Sliding-window up/down trigger over margins (reference
        GMM_VAD_SYNC margin averaging): True = speech."""
        m = self.frame_margins(feats)
        if len(m) == 0:
            return np.zeros(0, dtype=bool)
        kernel = np.ones(window) / window
        avg = np.convolve(m, kernel, mode="same")
        out = np.zeros(len(m), dtype=bool)
        in_sp = False
        for t in range(len(m)):
            if not in_sp and avg[t] > self.vad_up:
                in_sp = True
            elif in_sp and avg[t] < self.vad_down:
                in_sp = False
            out[t] = in_sp
        return out


def power_reject(feats: np.ndarray, veclen_power_idx: int,
                 thres: float) -> bool:
    """Average-power rejection (reference pass1.c:321 power_reject):
    True = reject.  Uses the absolute-energy coefficient."""
    if feats.shape[0] == 0:
        return True
    avg = float(np.mean(feats[:, veclen_power_idx]))
    return avg < thres
