"""Pass-2 A* stack decoding resident entirely on device.

The host-driven re-scan A* (`pass2_rescan.py`) pays one host<->TPU
round trip per batched round plus Python bookkeeping per expansion;
through the tunnel that floor is tens of seconds per utterance batch.
This module runs the WHOLE second pass — stack, pops, word re-scans,
LM probes, pushes, N-best termination — inside one jitted
`lax.while_loop`, so a full batch's A* costs one dispatch.

Algorithmically this is the reference's stack decoder with the
scan-at-pop structure of `search_bestfirst_main.c:787` (wchmm_fbs):

* a stack entry is a sentence prefix whose LAST word has not yet been
  acoustically re-scanned; its priority is the parent's exact g at the
  word's trellis begin + the pass-2 LM add + the word's pass-1 AM span
  score + the pass-1 suffix estimate (the reference pushes NEXTWORD
  candidates scored from the backtrellis the same way,
  `ngram_decode.c:566` ngram_nextwords + `search.h` NODE score);
* popping an entry runs the seeded word Viterbi against the outprob
  cache (`search_bestfirst_v1.c:589` scan_word; `scan._scan_core` —
  one lax.scan advances all B*P popped words at once), which re-derives
  the exact score and refined boundary; the exact g row is stored so
  every descendant seeds from it.  The pop is LAZY (deferred-evaluation
  A*): a freshly scanned entry is re-pushed with its exact priority
  FANNED OUT over the top A_RP boundary anchors of its own g+rest
  curve (one scan serves all of a word's boundary variants — the
  host's sibling-anchor merge, and the reason fresh entries recombine
  per (word, prev) regardless of pass-1 anchor), and only expands on a
  later pop, so expansion order and the N-best termination test run on
  exact scores — estimates only order the queue;
* next-word candidates come from trellis atoms whose begin frame falls
  within +-lookup_range of the boundary (`ngram_decode.c:428`), the
  stack keeps the best `4 * stack_size` anchor-variant entries (-s),
  and a hypothesis completes when the sentence-tail word is popped at
  the final frame with nothing on the stack estimating above the
  n-best-th completion (`search_bestfirst_main.c:1645`).

Differences from the host path, chosen for device-shaped execution:

* duplicate suppression is a keep-best merge over the (last word,
  boundary anchor, previous word) class at every push — (word, prev)
  for unscanned entries — instead of the host's pop-time `seen` map:
  for a 2-gram LM that class captures the LM context exactly, so the
  merge is the reference's hypothesis recombination done eagerly;
  already-scanned (exact-priority) entries may only be evicted by
  other exact entries, never by estimate-priority ones;
* the word envelope (-b2 wb_ok) admits `word_envelope` distinct word
  SEQUENCES per hypothesis length (rolling sequence hash);
* strict inter-word CD heads (v2) are supported via
  iwcd2.StrictIWCDTables row substitution; the remaining host-only
  semantics (order > 2 LMs, transparent words, during-search graph
  collection) take the host path (`engine._device_astar_ok`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.config import SearchConfig
from julius_tpu.search.ngram_device import DeviceNgram, bigram_score
from julius_tpu.search.pass2 import NBestResult, TrellisLattice
from julius_tpu.search.scan import (DeviceChainTables, _scan_core,
                                    _scan_core_win)
from julius_tpu.utils.logadd import LOG_ZERO

NEG_HALF = LOG_ZERO / 2
NEG_INF = float("-inf")

#: hypotheses popped per utterance per round
POPS = 8
#: candidate-table prune (prepare): anchor end-frames kept per
#: (begin, word) pair (the host's A_CAND analogue) ...
A_ENDS = 16
#: ... and atoms kept per begin frame overall — the candidate window
#: then holds at most (2*lookup_range+1) * Q_PER_FRAME atoms, which
#: sizes the round body's contiguous CA slice for COMPLETE coverage
Q_PER_FRAME = 96
#: children kept per pop after ranking (MAX_NEXT_WORDS-analogue)
CHILD_KEEP = 64
#: boundary anchors fanned out per scanned word (re-push slots; the
#: host's MAX_ANCHORS analogue, taken from the scan's own g+rest
#: peaks instead of pass-1 atom ends)
A_RP = 4
#: scan window frames per pop (words span tens of frames; utterances
#: hundreds — the scan only needs [anchor - (SCAN_WIN - WIN_TAIL),
#: anchor + WIN_TAIL).  Must exceed the longest plausible word span
#: plus boundary slack; entries earlier than the window are lost,
#: which only matters for words longer than ~SCAN_WIN - WIN_TAIL
#: frames (none in any tested config)
SCAN_WIN = 160
WIN_TAIL = 24
#: completion slots tracked per utterance (host filters to nbest)
NB_SLOTS = 8

#: trace-time debug printing (jax.debug.print per round; tests only)
_DEBUG = False
_TRACK = ()
#: perf-ablation bitmask (scratch diagnostics): 1=skip scan,
#: 2=skip candidate gathers, 4=skip LM probe, 8=skip store scatter
import os as _os
_ABLATE = int(_os.environ.get('P2D_ABLATE', '0'))
#: search statistics of the last run_batch dispatch (profiling)
LAST_STATS: dict = {}
#: g/beg-store budget (MB) bounding the per-utterance pop arena
MEM_MB = 384


@dataclass
class _Prepared:
    """Host-built per-batch inputs for the device A*."""

    ab: np.ndarray        # [B, NA] atom begin frames (sorted per utt)
    ae: np.ndarray        # [B, NA] atom end frames
    aw: np.ndarray        # [B, NA] atom word ids
    ainc: np.ndarray      # [B, NA] atom pass-1 AM span score
    rest: np.ndarray      # [B, T] suffix estimate (LOG_ZERO = dead)
    last: np.ndarray      # [B] final frame per utt (-1 = skip)
    packed: np.ndarray    # [B, NA, 6] per-atom candidate columns
    stack0: Tuple[np.ndarray, ...]   # initial stack field arrays


def _suffix_estimate_np(ab, ae, inc, T, lr, fmax=None):
    """rest[t] = best pass-1 continuation covering frames t+1..T-1:
    backward DP over trellis atoms scored with their FULL pass-1
    incremental scores (AM + pass-1 LM), chain step admitting begin
    frames in [t+1-lr, t+1+lr] with every frame of boundary slack
    CHARGED through `fmax`, the frame's best outprob: a late entry
    (gap) adds the skipped frames' fmax — a real path must cover them
    at <= fmax each, so the bound stays admissible — and an early
    entry (overlap) subtracts the doubled frames' fmax.

    Both halves of this formula carry a scar.  Round 4 charged slack
    but fed AM-only spans + a best-case per-word LM bound — ~100+ log
    points optimistic on DNN configs, queue churned to death (LVCSR
    0/32).  Early round 5 used full pass-1 incs but dropped the
    charge — fine on DNN (positive outprobs make an uncovered gap a
    LOSS), catastrophic on GMM: at ~-20/frame, +-5 uncharged slack
    hands every chain hop up to +100 free log points, rest inflates
    ~+700, and both rescan searches churned out empty while the
    reference decoded the same GMM-triphone files exactly (refparity
    triphone scenario).  Full incs + slack charge is right for both
    signs.  Mirrors the reference's use of trellis scores as the A*
    completion estimate (`search.h` NODE score, ngram_decode.c:334).

    GAP frames charge min(fmax, 0): when outprobs are positive (DNN),
    +fmax per skipped frame is admissible but LOOSE — it re-inflated
    the queue into budget exhaustion (179/179 rounds) the moment the
    charge came back — while 0 is tight and only pessimistic by the
    cover value a real word could actually collect there.  OVERLAP
    frames always subtract full fmax (removes the double count at the
    optimistic rate for both signs)."""
    if fmax is not None:
        cfm = np.concatenate([[0.0], np.cumsum(fmax)])
        cfm0 = np.concatenate([[0.0], np.cumsum(np.minimum(fmax, 0.0))])
    else:
        cfm = cfm0 = np.zeros(T + 1)
    rest = np.full(T + 1, -np.inf)
    rest[T - 1] = 0.0            # nothing left after the final frame
    for t in range(T - 2, -1, -1):
        i0 = np.searchsorted(ab, t + 1 - lr)
        i1 = np.searchsorted(ab, t + 1 + lr, side="right")
        best = -np.inf
        if i1 > i0:
            b = np.clip(ab[i0:i1], 0, T)
            e = ae[i0:i1]
            adj = np.where(b >= t + 1,
                           cfm0[b] - cfm0[t + 1],
                           cfm[b] - cfm[t + 1])
            v = adj + inc[i0:i1] + rest[e]
            v = np.where(e > t, v, -np.inf)
            if len(v):
                best = v.max()
        rest[t] = best
    return rest[:T]


def _best_path_rest(lat: TrellisLattice, lw1: float,
                    lw2: float) -> Optional[np.ndarray]:
    """Suffix-score curve of pass-1's best path: rest1[t] = (path
    total) - (path cumulative through frame t), linearly interpolated
    inside word spans, with each word's pass-1 LM portion re-weighted
    by lw2/lw1.  The best path tiles every frame, so this estimate is
    finite everywhere and achievable by construction."""
    T, M = lat.T, lat.M
    row_s = np.where(lat.word[T - 1] >= 0, lat.score[T - 1], -np.inf)
    if not np.isfinite(row_s).any():
        return None
    m = int(np.argmax(row_s))
    ratio = (lw2 / lw1) if lw1 else 1.0
    ends, cums = [], []
    a = (T - 1) * M + m
    raw = []
    while a >= 0:
        t, mm = divmod(a, M)
        raw.append((t, float(lat.score[t, mm]), float(lat.lm[t, mm])))
        a = int(lat.prev[t, mm])
    raw.reverse()
    cum = 0.0
    prev_raw = 0.0
    for (t, c, l) in raw:
        inc = c - prev_raw
        prev_raw = c
        cum += inc + l * (ratio - 1.0)
        ends.append(t)
        cums.append(cum)
    total = cums[-1]
    xp = np.asarray([-1] + ends, dtype=np.float64)
    fp = np.asarray([0.0] + cums)
    cum_at = np.interp(np.arange(T), xp, fp)
    return (total - cum_at).astype(np.float64)


def _best_lm_in(strategy, n_words: int) -> np.ndarray:
    """best_in[w] = an upper bound on log10 P(w | any context) under
    the strategy's N-gram: max of the best bigram into w and the
    unigram+best-back-off path.  Used to make the suffix estimate's
    per-word LM charge optimistic — pass-1 atoms record the LM of
    pass-1's OWN best predecessor, and inheriting that (often back-off)
    cost makes the estimate pessimistic exactly on the paths whose
    context pass 2 is supposed to fix, burying them below junk and
    burning the word envelope before they pop."""
    lm = getattr(strategy, "lm", None)
    wid2lm = getattr(strategy, "wid2lm", None)
    if wid2lm is not None:
        n_words = max(n_words, len(wid2lm))
    out = np.full(n_words, -99.0, np.float64)
    if lm is None or wid2lm is None:
        return out
    Vl = len(lm.words)
    uni = np.full(Vl, -99.0)
    bo = np.zeros(Vl)
    for (i,), (lp, b) in lm.ngrams[0].items():
        uni[i] = lp
        bo[i] = b
    best_bi = np.full(Vl, -np.inf)
    if lm.order >= 2:
        for (v, w), (lp, _b) in lm.ngrams[1].items():
            if lp > best_bi[w]:
                best_bi[w] = lp
    max_bo = max(0.0, bo.max()) if Vl else 0.0
    best = np.maximum(uni + max_bo, best_bi)
    wl = np.asarray(wid2lm)
    okm = wl >= 0
    out[:len(wl)][okm] = best[np.clip(wl, 0, Vl - 1)][okm]
    return out


def prepare(lattices: List[Optional[TrellisLattice]], T: int,
            strategy, cfg: SearchConfig, stack_size: int,
            cprob_np: Optional[np.ndarray] = None,
            best_in: Optional[np.ndarray] = None,
            fmax: Optional[np.ndarray] = None) -> _Prepared:
    """Build the per-batch atom tables, suffix estimates, and initial
    stacks (sentence-head candidates at frame 0, reference
    get_backtrellis_words' first-word seeding, ngram_decode.c:334)."""
    B = len(lattices)
    lr = max(0, int(cfg.lookup_range))
    lw2v = float(cfg.lm_weight2)
    pen2v = float(cfg.lm_penalty2)
    if best_in is None:
        n_vocab = 0
        for lat in lattices:
            if lat is not None and lat.T:
                n_vocab = max(n_vocab, int(lat.word.max()) + 1)
        best_in = _best_lm_in(strategy, max(1, n_vocab))
    na = 1
    per = []
    for lat in lattices:
        if lat is None or lat.T == 0:
            per.append(None)
            continue
        t_idx, m_idx = np.nonzero(lat.word >= 0)
        b = lat.begin[t_idx, m_idx].astype(np.int64)
        order = np.argsort(b, kind="stable")
        ab = b[order]
        ae = t_idx[order].astype(np.int64)
        aw = lat.word[t_idx, m_idx][order].astype(np.int64)
        asc = lat.score[t_idx, m_idx][order].astype(np.float64)
        alm = lat.lm[t_idx, m_idx][order].astype(np.float64)
        prev = lat.prev[t_idx, m_idx][order]
        pt, pm = np.divmod(np.maximum(prev, 0), lat.M)
        pscore = np.where(prev >= 0, lat.score[pt, pm], 0.0)
        # AM-only span score of the atom's word (pass-1 LM removed):
        # a CANDIDATE's estimate adds its exact pass-2 LM instead
        ainc = asc - pscore - alm
        # the suffix estimate chains FULL pass-1 incremental scores
        # (AM + pass-1 LM) like the host path — see _suffix_estimate_np
        # for why tight beats admissible — with the pass-1 LM portion
        # re-weighted into the PASS-2 scale (lw2/lw1, like
        # _best_path_rest): exact scores accumulate lm_weight2-weighted
        # probs, so an un-reweighted estimate is off by
        # (lw2-lw1)*|log p| per remaining word whenever the passes use
        # different weights (-lmp vs -lmp2)
        lw1v = float(cfg.lm_weight)
        ratio = (lw2v / lw1v) if lw1v else 1.0
        inc_rw = (asc - pscore - alm) + alm * ratio
        fm = (fmax[len(per), :lat.T] if fmax is not None else None)
        rest = _suffix_estimate_np(ab, ae, inc_rw, lat.T, lr, fm)
        # anchor the estimate on pass-1's own best path: a REAL path
        # covering every frame, so its suffix curve has no holes and no
        # compounding per-word bounds — the atom-chain DP above can
        # only raise it where a better continuation provably exists.
        # (LM portions re-weighted into the pass-2 scale.)
        r1 = _best_path_rest(lat, float(cfg.lm_weight),
                             float(cfg.lm_weight2))
        if r1 is not None:
            rest = np.maximum(rest, r1)
        # prune the CANDIDATE table (the suffix DP above used the FULL
        # atom set).  Within one begin frame the candidate ranking is
        # parent-independent — est0 = gb(begin) + (lm_opt + AM span +
        # rest[end]) and gb depends only on the begin — so keeping the
        # top Q_PER_FRAME atoms per begin frame provably preserves
        # every window's true top-CHILD_KEEP children, and bounds the
        # window population to (2lr+1)*Q so the contiguous CA slice in
        # the round body never overflows.  (Round 4 sliced a fixed 768
        # atoms out of windows holding 1500+; whole words silently
        # vanished from the candidate set — the LVCSR truth path among
        # them.)  Tail-word atoms bypass the cap: completion anchors
        # must survive (the host appends the Tl-1 anchor for may_final
        # words the same way, _cand_for).
        lm_opt_at = (lw2v * best_in[np.minimum(aw, len(best_in) - 1)]
                     + pen2v
                     + (cprob_np[np.minimum(aw, len(cprob_np) - 1)]
                        if cprob_np is not None else 0.0))
        rest_ae = rest[np.minimum(ae, lat.T - 1)]
        indep = np.where(np.isfinite(rest_ae),
                         ainc + lm_opt_at + rest_ae, -np.inf)
        tailw = int(strategy.tail_word)
        is_tail = aw == tailw
        n_at = len(ab)
        pos = np.arange(n_at)
        # rank within (begin, word) groups, best-indep first
        o2 = np.lexsort((-indep, aw, ab))
        newg = np.r_[True, (ab[o2][1:] != ab[o2][:-1])
                     | (aw[o2][1:] != aw[o2][:-1])]
        rank_bw = pos - np.maximum.accumulate(np.where(newg, pos, 0))
        keep = np.zeros(n_at, bool)
        keep[o2] = rank_bw < A_ENDS
        # rank within begin frames among survivors
        ind2 = np.where(keep, indep, -np.inf)
        o3 = np.lexsort((-ind2, ab))
        newb = np.r_[True, ab[o3][1:] != ab[o3][:-1]]
        rank_b = pos - np.maximum.accumulate(np.where(newb, pos, 0))
        keep2 = np.zeros(n_at, bool)
        keep2[o3] = rank_b < Q_PER_FRAME
        keep &= keep2 | is_tail
        keep &= np.isfinite(indep) | is_tail
        ab, ae, aw, ainc = ab[keep], ae[keep], aw[keep], ainc[keep]
        per.append((ab, ae, aw, ainc, rest))
        na = max(na, len(ab))
    # rolling word-sequence hash (sequence identity for completion
    # dedup and the word envelope; anchor variants of one sequence
    # share it, distinct sequences collide with ~2^-32 probability)
    def seq_mix(h, w):
        return (np.asarray(h, np.uint32) * np.uint32(1000003)
                + np.asarray(w, np.uint32) + np.uint32(1))
    ab_a = np.full((B, na), 1 << 30, np.int32)
    ae_a = np.zeros((B, na), np.int32)
    aw_a = np.zeros((B, na), np.int32)
    ainc_a = np.full((B, na), LOG_ZERO, np.float32)
    rest_a = np.full((B, T), LOG_ZERO, np.float32)
    last_a = np.full(B, -1, np.int32)
    S = stack_size
    s_prio = np.full((B, S), NEG_INF, np.float32)
    s_w = np.zeros((B, S), np.int32)
    s_t = np.zeros((B, S), np.int32)
    s_prev = np.full((B, S), -1, np.int32)
    s_parent = np.full((B, S), -1, np.int32)
    s_lm_add = np.zeros((B, S), np.float32)
    s_lm_sum = np.zeros((B, S), np.float32)
    s_row = np.full((B, S), -1, np.int32)
    s_len = np.ones((B, S), np.int32)
    s_seqh = np.zeros((B, S), np.uint32)
    for bidx, (lat, p) in enumerate(zip(lattices, per)):
        if p is None:
            continue
        ab, ae, aw, ainc, rest = p
        n = len(ab)
        ab_a[bidx, :n] = ab
        ae_a[bidx, :n] = ae
        aw_a[bidx, :n] = aw
        ainc_a[bidx, :n] = ainc
        rest_a[bidx, :lat.T] = np.where(np.isfinite(rest), rest, LOG_ZERO)
        last_a[bidx] = lat.T - 1
        # initial candidates: atoms beginning at frame 0 (lr = 0 for
        # the sentence-initial lookup), deduped (word, end) best-first
        i1 = np.searchsorted(ab, 0, side="right")
        if i1 == 0:
            last_a[bidx] = -1
            continue
        w0, e0, inc0 = aw[:i1], ae[:i1], ainc[:i1]
        r0 = rest[e0]
        lm0 = np.array([strategy.lm_add((), int(w)) for w in w0],
                       np.float64)
        est = lm0 + inc0 + r0
        est = np.where(np.isfinite(est), est, NEG_INF)
        key = w0 * (T + 1) + e0
        order = np.lexsort((-est, key))
        keep = np.r_[True, key[order][1:] != key[order][:-1]]
        sel = order[keep]
        sel = sel[np.argsort(-est[sel], kind="stable")][:S]
        n0 = len(sel)
        s_prio[bidx, :n0] = est[sel]
        s_w[bidx, :n0] = w0[sel]
        s_t[bidx, :n0] = e0[sel]
        s_lm_add[bidx, :n0] = lm0[sel]
        s_lm_sum[bidx, :n0] = lm0[sel]
        s_seqh[bidx, :n0] = seq_mix(0, w0[sel])
    # per-atom packed columns (the device candidate block fetches them
    # as one contiguous slice per pop): begin, end, word, AM span,
    # rest[end], and the optimistic LM add for the word — the latter
    # two precomputed here so the round body never random-gathers them
    lw2v_ = float(cfg.lm_weight2)
    pen2v_ = float(cfg.lm_penalty2)
    bi = best_in if best_in is not None else np.zeros(1)
    lm_opt_a = (lw2v_ * bi[np.minimum(aw_a, len(bi) - 1)] + pen2v_
                + (cprob_np[np.minimum(aw_a, len(cprob_np) - 1)]
                   if cprob_np is not None else 0.0))
    rest_ae = np.take_along_axis(
        rest_a, np.minimum(ae_a, rest_a.shape[1] - 1), axis=1)
    packed = np.stack(
        [ab_a.astype(np.float32), ae_a.astype(np.float32),
         aw_a.astype(np.float32), ainc_a.astype(np.float32),
         rest_ae.astype(np.float32), lm_opt_a.astype(np.float32)],
        axis=2)
    return _Prepared(
        ab=ab_a, ae=ae_a, aw=aw_a, ainc=ainc_a, rest=rest_a, last=last_a,
        packed=packed,
        stack0=(s_prio, s_w, s_t, s_prev, s_parent, s_lm_add, s_lm_sum,
                s_row, s_len, s_seqh))


@partial(jax.jit, static_argnames=(
    "P", "S", "CA", "CK", "CAPP", "max_rounds", "T", "lr", "tail",
    "nbest", "lw2", "pen2", "wb", "strict_heads"))
def _astar_loop(loc_all, ent_all, ext_all, sidx_all, ng: DeviceNgram,
                wid2lm, cprobv, lm_opt_w, out_ext,
                ab, ae, aw, ainc, atoms_packed, rest, cfm, last,
                stack0, hs_all, hn_all, lc_of_word,
                *, P: int, S: int, CA: int, CK: int, CAPP: int,
                max_rounds: int, T: int, lr: int, tail: int,
                nbest: int, lw2: float, pen2: float, wb: int,
                strict_heads: bool):
    """One dispatch = the whole batched A*.  Returns (results, arena,
    stores); see `run_batch` for the host-side decoding of the outputs.
    """
    B = out_ext.shape[0]
    R = out_ext.shape[2]
    out_flat = out_ext.reshape(-1)
    V_dead = loc_all.shape[0] - 1
    K = B * P
    bvec = jnp.arange(B, dtype=jnp.int32)

    g_store = jnp.full((B * CAPP, T), LOG_ZERO, jnp.float32)
    beg_store = jnp.zeros((B * CAPP, T), jnp.int32)
    arena_w = jnp.full((B, CAPP), -1, jnp.int32)
    arena_t = jnp.zeros((B, CAPP), jnp.int32)
    arena_parent = jnp.full((B, CAPP), -1, jnp.int32)
    arena_lm_sum = jnp.zeros((B, CAPP), jnp.float32)
    res_score = jnp.full((B, NB_SLOTS), NEG_INF, jnp.float32)
    res_arena = jnp.full((B, NB_SLOTS), -1, jnp.int32)
    res_seqh = jnp.zeros((B, NB_SLOTS), jnp.uint32)
    n_pops = jnp.zeros(B, jnp.int32)
    active = last >= 0
    round_i = jnp.int32(0)
    LEN_CAP = 128
    env_cnt = jnp.zeros((B, LEN_CAP), jnp.int32)
    ENV_H = 8192
    env_seen = jnp.zeros((B, ENV_H), jnp.int32)

    state = (stack0, g_store, beg_store, arena_w, arena_t, arena_parent,
             arena_lm_sum, res_score, res_arena, res_seqh, n_pops,
             active, round_i, env_cnt, env_seen)

    def cond(state):
        active = state[11]
        round_i = state[12]
        return jnp.any(active) & (round_i < max_rounds)

    def body(state):
        (stack, g_store, beg_store, arena_w, arena_t, arena_parent,
         arena_lm_sum, res_score, res_arena, res_seqh, n_pops, active,
         round_i, env_cnt, env_seen) = state
        (s_prio, s_w, s_t, s_prev, s_parent, s_lm_add, s_lm_sum,
         s_row, s_len, s_seqh) = stack

        # ---- pop the top P entries of every active utterance
        # (top_k, not a head slice: the fast merge path below keeps the
        # stack unsorted)
        pprio, pop_idx = jax.lax.top_k(s_prio, P)
        pw = jnp.take_along_axis(s_w, pop_idx, axis=1)
        pt = jnp.take_along_axis(s_t, pop_idx, axis=1)
        pprev = jnp.take_along_axis(s_prev, pop_idx, axis=1)
        pparent = jnp.take_along_axis(s_parent, pop_idx, axis=1)
        plm_add = jnp.take_along_axis(s_lm_add, pop_idx, axis=1)
        plm_sum = jnp.take_along_axis(s_lm_sum, pop_idx, axis=1)
        prow_own = jnp.take_along_axis(s_row, pop_idx, axis=1)
        plen = jnp.take_along_axis(s_len, pop_idx, axis=1)
        pseqh = jnp.take_along_axis(s_seqh, pop_idx, axis=1)
        s_prio = s_prio.at[bvec[:, None], pop_idx].set(NEG_INF)
        valid = (pprio > NEG_HALF) & active[:, None]
        scanned = valid & (prow_own >= 0)
        fresh = valid & (prow_own < 0)
        # envelope class = the word SEQUENCE (rolling hash; the host
        # path admits `wb` distinct sequences per length the same way,
        # reference wb_ok counts hypotheses); fresh pops of a full,
        # never-admitted sequence are killed before they spend their
        # scan + re-push pop pair
        lidx = jnp.clip(plen, 0, LEN_CAP - 1)
        ekey = ((pseqh * jnp.uint32(2654435761))
                % jnp.uint32(ENV_H)).astype(jnp.int32)
        eseen = jnp.take_along_axis(env_seen, ekey, axis=1) > 0
        env_ok = eseen | (jnp.take_along_axis(env_cnt, lidx, axis=1)
                          < wb)
        is_tail_pop = pw == tail
        fresh = fresh & (env_ok | is_tail_pop)
        valid = fresh | scanned

        # ---- arena slots for this round (one row per pop slot; only
        # fresh pops consume theirs — a scanned pop's row already holds
        # its exact g from its first pop)
        base = round_i * P
        aidx = base + jnp.arange(P, dtype=jnp.int32)[None, :]   # [B, P]
        rows = bvec[:, None] * CAPP + aidx                       # [B, P]

        # ---- scan-at-(first-)pop: seeded word Viterbi for the popped
        # word of every fresh entry (scanned re-pops ride a dead chain),
        # WINDOWED to SCAN_WIN frames ending a little past the entry's
        # anchor — words span tens of frames while utterances span
        # hundreds, and the windowed fetch+scan is ~T/W times cheaper
        # than the full-T one that used to dominate the round
        # (reference scan_word walks only the word's frames for the
        # same reason, search_bestfirst_v1.c:589)
        W = min(SCAN_WIN, T)
        wids = jnp.where(fresh, pw, V_dead).reshape(K)
        prow = jnp.where(pparent >= 0,
                         bvec[:, None] * CAPP + pparent, 0).reshape(K)
        pg = g_store[prow]                                       # [K, T]
        has_parent = (pparent >= 0).reshape(K)
        ext_seed = jnp.concatenate(
            [jnp.full((K, 1), LOG_ZERO, jnp.float32), pg[:, :-1]],
            axis=1) + plm_add.reshape(K)[:, None]
        init_seed = jnp.full((K, T), LOG_ZERO, jnp.float32) \
            .at[:, 0].set(plm_add.reshape(K))
        seed = jnp.where(has_parent[:, None], ext_seed, init_seed)
        # window start: cover [anchor - (W - WIN_TAIL), anchor +
        # WIN_TAIL); sentence-initial entries must include frame 0
        w0 = jnp.clip(pt.reshape(K) - (W - WIN_TAIL), 0,
                      max(T - W, 0))
        w0 = jnp.where(has_parent, w0, 0)
        bidx = jnp.repeat(bvec, P)
        seed_w = jax.vmap(
            lambda s, o: jax.lax.dynamic_slice(s, (o,), (W,)))(seed, w0)
        if _ABLATE & 1:
            g = seed
            beg = jnp.zeros((K, T), jnp.int32)
        else:
            # fetch the [K, W, N] outprob block: per-pop window slices
            # of out_ext (cacheline-friendly dynamic slices), selected
            # through sidx as a ONE-HOT MATMUL on the MXU — TPU element
            # gathers move ~10^8 elements/s while the batched
            # [W, R] x [R, N] GEMM moves the same data at matmul speed
            NN = loc_all.shape[2]
            sidx_k = sidx_all[wids]                              # [K, N]
            if strict_heads:
                # strict inter-word CD (PASS2_STRICT_IWCD,
                # search_bestfirst_v2.c:911): substitute the word-head
                # states' outprob rows with the EXACT left-context
                # triphone of the popped entry's previous word —
                # iwcd2.StrictIWCDTables, the same table the host v2
                # path gathers.  Class 0 (no previous word / no exact
                # model) keeps the v1 pseudo rows, matching the
                # reference fallback chain (outprob_style.c lcdset)
                lc = jnp.where(pprev >= 0,
                               lc_of_word[jnp.maximum(pprev, 0)],
                               0).reshape(K)
                hs = hs_all[wids, lc]                            # [K, H]
                hn = hn_all[wids]                                # [K]
                Hh = hs.shape[1]
                colv = jnp.arange(NN, dtype=jnp.int32)
                hs_pad = jnp.zeros((K, NN), jnp.int32) \
                    .at[:, :Hh].set(hs)
                sidx_k = jnp.where(
                    colv[None, :] < jnp.minimum(hn, Hh)[:, None],
                    hs_pad, sidx_k)
            out_win = jax.vmap(
                lambda b, o: jax.lax.dynamic_slice(
                    out_ext, (b, o, 0), (1, W, R))[0])(
                bidx, w0)                                        # [K,W,R]
            oh = (sidx_k[:, None, :]
                  == jnp.arange(R, dtype=jnp.int32)[None, :, None]
                  ).astype(out_ext.dtype)                        # [K,R,N]
            outw = jax.lax.batch_matmul(
                out_win, oh,
                precision=jax.lax.Precision.HIGHEST)             # [K,W,N]
            g_w, beg_w, _sv = _scan_core_win(
                loc_all[wids], ent_all[wids], ext_all[wids],
                seed_w, outw, w0)                                # [K, W]
            g = jax.vmap(
                lambda gw, o: jax.lax.dynamic_update_slice(
                    jnp.full(T, LOG_ZERO, jnp.float32), gw, (o,)))(
                g_w, w0)
            beg = jax.vmap(
                lambda bw, o: jax.lax.dynamic_update_slice(
                    jnp.zeros(T, jnp.int32), bw, (o,)))(beg_w, w0)
        if not (_ABLATE & 8):
            g_store = g_store.at[rows.reshape(K)].set(g)
            beg_store = beg_store.at[rows.reshape(K)].set(beg)
        exact = jnp.take_along_axis(
            g.reshape(B, P, T), pt[..., None], axis=2)[..., 0]   # [B, P]

        # ---- arena append (fresh pops only carry a word)
        arena_w = jax.lax.dynamic_update_slice(
            arena_w, jnp.where(fresh, pw, -1), (0, base))
        arena_t = jax.lax.dynamic_update_slice(arena_t, pt, (0, base))
        arena_parent = jax.lax.dynamic_update_slice(
            arena_parent, pparent, (0, base))
        arena_lm_sum = jax.lax.dynamic_update_slice(
            arena_lm_sum, plm_sum, (0, base))

        # ---- completions: tail word first-popped at the final frame
        # (exact known right away, no re-push needed)
        is_final = (fresh & (pw == tail) & (pt == last[:, None])
                    & (exact > NEG_HALF))
        comp_s = jnp.where(is_final, exact, NEG_INF)
        # the n-best termination below counts DISTINCT sentences;
        # boundary-anchor variants of one sequence share the rolling
        # sequence hash, so completions whose sequence is already
        # recorded are dropped (the host path dedups by word sequence
        # after download the same way — exact identity, not the old
        # score-proximity proxy that also killed near-tied DISTINCT
        # sequences)
        dup_prev = jnp.any(
            (pseqh[:, :, None] == res_seqh[:, None, :])
            & (res_score[:, None, :] > NEG_HALF), axis=2)
        dup_self = jnp.any(
            (pseqh[:, :, None] == pseqh[:, None, :])
            & is_final[:, None, :]
            & (jnp.arange(P)[None, :, None] > jnp.arange(P)[None, None, :]),
            axis=2)
        comp_s = jnp.where(dup_prev | dup_self, NEG_INF, comp_s)
        rs2 = jnp.concatenate([res_score, comp_s], axis=1)
        ra2 = jnp.concatenate(
            [res_arena, jnp.broadcast_to(aidx, (B, P))], axis=1)
        rh2 = jnp.concatenate([res_seqh, pseqh], axis=1)
        order_r = jnp.argsort(-rs2, axis=1, stable=True)[:, :NB_SLOTS]
        res_score = jnp.take_along_axis(rs2, order_r, axis=1)
        res_arena = jnp.take_along_axis(ra2, order_r, axis=1)
        res_seqh = jnp.take_along_axis(rh2, order_r, axis=1)

        # ---- lazy A* re-push with ANCHOR FAN-OUT: a fresh non-final
        # pop goes back on the stack at the top A_RP boundary anchors
        # of its OWN exact g + rest curve (local maxima over a +-2
        # window, so one plateau yields one anchor).  The scan already
        # re-derived g at every frame, so the anchors come from exact
        # scores instead of pass-1 atom ends — and one scan serves all
        # of a word's boundary variants.  (The previous design pushed
        # one FRESH entry per pass-1 anchor, each of which paid its
        # own identical scan: ~8-16x the scan volume per hypothesis
        # word, the measured round-count driver; the host path merges
        # sibling anchors into one scan request the same way,
        # pass2_rescan.py:846.)
        gr = g.reshape(B, P, T) + rest[:, None, :]
        gr = jnp.where((g.reshape(B, P, T) > NEG_HALF)
                       & (rest[:, None, :] > NEG_HALF), gr, NEG_INF)
        # local-maxima suppression: keep frames that win their +-2 hood
        grp = gr
        for d_ in (1, 2):
            grp = jnp.maximum(
                grp,
                jnp.maximum(
                    jnp.pad(gr[:, :, d_:], ((0, 0), (0, 0), (0, d_)),
                            constant_values=NEG_INF),
                    jnp.pad(gr[:, :, :-d_], ((0, 0), (0, 0), (d_, 0)),
                            constant_values=NEG_INF)))
        gr_lm = jnp.where(gr >= grp, gr, NEG_INF)
        rp_prio, rp_t = jax.lax.top_k(gr_lm, A_RP)               # [B,P,A]
        repush = (fresh & ~is_final & (exact > NEG_HALF))[..., None]
        r_prio = jnp.where(repush & (rp_prio > NEG_HALF),
                           rp_prio, NEG_INF).reshape(B, P * A_RP)
        r_t = rp_t.astype(jnp.int32).reshape(B, P * A_RP)
        r_w = jnp.repeat(pw, A_RP, axis=1)
        r_prev = jnp.repeat(pprev, A_RP, axis=1)
        r_parent = jnp.repeat(pparent, A_RP, axis=1)
        r_lm_add = jnp.repeat(plm_add, A_RP, axis=1)
        r_lm_sum = jnp.repeat(plm_sum, A_RP, axis=1)
        r_row = jnp.repeat(jnp.broadcast_to(aidx, (B, P)), A_RP, axis=1)
        r_len = jnp.repeat(plen, A_RP, axis=1)
        r_seqh = jnp.repeat(pseqh, A_RP, axis=1)

        # ---- next-word candidates for SCANNED pops: trellis atoms
        # whose begin falls in +-lr of the boundary
        # (ngram_decode.c:428 ngram_nextwords)
        tau = pt + 1                                             # [B, P]
        # word envelope (-b2 wb_ok, search_bestfirst_main.c:847):
        # at most `wb` hypothesis CLASSES of each length may expand;
        # with inexact push estimates this is what bounds re-expansion
        # churn (there is no persistent host-style `seen` set here).
        # The budget is charged per (length, word, prev) class, not per
        # pop: one word's boundary-anchor variants are the same
        # sentence hypothesis (the host path counts distinct word
        # sequences the same way) and would otherwise burn the whole
        # per-length budget by themselves
        expandable = scanned & (pw != tail) & env_ok
        newclass = expandable & ~eseen
        env_cnt = env_cnt.at[bvec[:, None], lidx].add(
            newclass.astype(jnp.int32))
        env_seen = env_seen.at[bvec[:, None], ekey].max(
            expandable.astype(jnp.int32))
        i0 = jax.vmap(
            lambda a, v: jnp.searchsorted(a, v, side="left"))(
            ab, tau - lr)                                        # [B, P]
        NA = ab.shape[1]
        idx = (jnp.maximum(jnp.minimum(i0, NA - CA), 0)[..., None]
               + jnp.arange(CA, dtype=jnp.int32))                # [B,P,CA]
        inb = idx < NA
        if _ABLATE & 2:
            cb = jnp.ones((B, P, CA), jnp.int32)
            ce = jnp.full((B, P, CA), 2, jnp.int32)
            cw = jnp.zeros((B, P, CA), jnp.int32)
            cinc = jnp.zeros((B, P, CA), jnp.float32)
        else:
            # the window is CONTIGUOUS in the begin-sorted atom arrays,
            # so fetch it as 512 vmapped dynamic slices (an XLA gather
            # with [CA, 6] slice sizes) — element gathers move ~10^8
            # elements/s on TPU, slice gathers move cachelines
            i0c = jnp.minimum(i0, NA - CA)
            packed = jax.vmap(jax.vmap(
                lambda arr, s: jax.lax.dynamic_slice(
                    arr, (s, 0), (CA, 6)),
                in_axes=(None, 0)), in_axes=(0, 0))(
                atoms_packed, jnp.maximum(i0c, 0))   # [B, P, CA, 6]
            cb = packed[..., 0].astype(jnp.int32)
            ce = packed[..., 1].astype(jnp.int32)
            cw = packed[..., 2].astype(jnp.int32)
            cinc = packed[..., 3]
            rest_e_pk = packed[..., 4]
            lm_opt_pk = packed[..., 5]
        ok = (inb & expandable[..., None]
              & (cb <= (tau + lr)[..., None])
              & (ce >= tau[..., None]) & (cb >= 1))
        # a tail-word child is only useful anchored at the final frame
        # (completion), so FORCE its anchor there — pass 1 often records
        # the tail's best atom ending a few frames short and the exact
        # scan re-derives the true boundary anyway (the host path's
        # defensive Tl-1 anchor, pass2_rescan._cand_for).  A non-tail
        # child at the final frame is dead weight (it could neither
        # complete nor expand past the utterance) — prune it.
        ce = jnp.where(cw == tail,
                       jnp.broadcast_to(last[:, None, None], ce.shape), ce)
        ok = ok & ((cw == tail) | (ce != last[:, None, None]))
        # admission ranks with the OPTIMISTIC per-word LM bound (a
        # packed column); the exact 2-gram hash probe below runs only on
        # the CK survivors — probing all CA candidates was ~3M chained
        # hash-row gathers per round, the measured round hotspot
        lm_opt_c = lm_opt_pk
        # estimate: parent's exact g near the atom's begin + LM + the
        # atom's pass-1 AM span + suffix estimate from its end.  The
        # entry bound takes the max over entry frames t' in +-lr of
        # the atom's begin of g[t'] + the fmax-charged slack between
        # t'+1 and the begin (admissible: a real path covers the
        # bridged frames at <= fmax each): max_t' (g[t'] - cfm[t'+1])
        # + cfm[begin].  Pinning at exactly begin-1 starves truth
        # whenever pass-1 recorded the begin from a DIFFERENT
        # predecessor whose boundary this parent cannot meet (the
        # single-best-entry approximation the re-scan exists to fix);
        # the inflation the charge admits (~fmax per slack frame on
        # DNN configs) is kept out of the class recombination by the
        # exact-entry immunity rule in the merge below.  cb only takes
        # the 2lr+1 values in [tau-lr, tau+lr], so fetch h = g - cfm
        # at the 4lr+1 frames the dilation can touch, slide an
        # (2lr+1)-max over them, and resolve each candidate with a
        # select instead of a [B,P,CA] random gather.
        W11 = 2 * lr + 1
        g_own_rows = jnp.where(scanned, bvec[:, None] * CAPP + prow_own,
                               0)                                 # [B, P]
        # positions: entry frames t' = tau-2lr-1 .. tau+2lr-1
        posw = (tau[..., None] - 2 * lr - 1
                + jnp.arange(4 * lr + 1, dtype=jnp.int32))       # [B,P,4lr+1]
        posc = jnp.clip(posw, 0, T - 1)
        h_at = (g_store[g_own_rows.reshape(K)].reshape(B, P, T))
        h_at = jnp.take_along_axis(h_at, posc, axis=2) \
            - jnp.take_along_axis(
                jnp.broadcast_to(cfm[:, None, 1:], (B, P, T)),
                posc, axis=2)
        h_at = jnp.where(posw >= 0, h_at, LOG_ZERO)
        # dilated value at offset d (entry t' = tau-lr-1+d +- lr):
        # max over h_at[d : d+2lr+1]
        h_sel = [jnp.max(
            jax.lax.dynamic_slice_in_dim(h_at, d, W11, axis=2),
            axis=2) for d in range(W11)]
        h_sel = jnp.stack(h_sel, axis=2)                         # [B,P,W11]
        cfm_sel = jnp.take_along_axis(
            jnp.broadcast_to(cfm[:, None, :], (B, P, T + 1)),
            jnp.clip(tau[..., None] - lr
                     + jnp.arange(W11, dtype=jnp.int32), 0, T), axis=2)
        cb_rel = jnp.clip(cb - (tau[..., None] - lr), 0, W11 - 1)
        gb = jnp.full((B, P, CA), LOG_ZERO, jnp.float32)
        for d in range(W11):
            hit = cb_rel == d
            gb = jnp.where(
                hit, h_sel[:, :, d:d + 1] + cfm_sel[:, :, d:d + 1], gb)
        rest_e = rest_e_pk
        est0 = gb + lm_opt_c + cinc + rest_e
        ok = ok & (gb > NEG_HALF) & (rest_e > NEG_HALF) \
            & (cinc > NEG_HALF)
        prio0 = jnp.where(ok, est0, NEG_INF)
        # keep the best CK children per pop (MAX_NEXT_WORDS analogue)
        top_p, top_i = jax.lax.top_k(prio0, CK)                  # [B,P,CK]
        c_w = jnp.take_along_axis(cw, top_i, axis=2).reshape(B, P * CK)
        c_t = jnp.take_along_axis(ce, top_i, axis=2).reshape(B, P * CK)
        # exact weighted 2-gram for the survivors (device hash probe)
        v_lm = jnp.broadcast_to(wid2lm[pw][..., None],
                                (B, P, CK)).reshape(B, P * CK)
        w_lm = wid2lm[c_w]
        if _ABLATE & 4:
            lp = jnp.zeros_like(v_lm, dtype=jnp.float32)
        else:
            lp = bigram_score(ng, v_lm, w_lm)
            lp = jnp.where(w_lm < 0, -99.0, lp)
        c_lm_add = lw2 * lp + pen2 + cprobv[c_w]
        c_opt = jnp.take_along_axis(lm_opt_c, top_i, axis=2) \
            .reshape(B, P * CK)
        c_prio = jnp.where(
            top_p.reshape(B, P * CK) > NEG_HALF,
            top_p.reshape(B, P * CK) - c_opt + c_lm_add, NEG_INF)
        c_prev = jnp.broadcast_to(pw[..., None],
                                  (B, P, CK)).reshape(B, P * CK)
        c_parent = jnp.broadcast_to(prow_own[..., None],
                                    (B, P, CK)).reshape(B, P * CK)
        c_lm_sum = (jnp.broadcast_to(plm_sum[..., None], (B, P, CK))
                    .reshape(B, P * CK) + c_lm_add)
        c_row = jnp.full((B, P * CK), -1, jnp.int32)
        c_len = (jnp.broadcast_to(plen[..., None], (B, P, CK))
                 .reshape(B, P * CK) + 1)
        c_seqh = (jnp.broadcast_to(pseqh[..., None], (B, P, CK))
                  .reshape(B, P * CK) * jnp.uint32(1000003)
                  + c_w.astype(jnp.uint32) + jnp.uint32(1))

        # ---- merge the whole (popped-out) stack + re-pushes +
        # children; recombine duplicates, then trim back to S
        m_prio = jnp.concatenate([s_prio, r_prio, c_prio], axis=1)
        m_w = jnp.concatenate([s_w, r_w, c_w], axis=1)
        m_t = jnp.concatenate([s_t, r_t, c_t], axis=1)
        m_prev = jnp.concatenate([s_prev, r_prev, c_prev], axis=1)
        m_parent = jnp.concatenate(
            [s_parent, r_parent, c_parent], axis=1)
        m_lm_add = jnp.concatenate(
            [s_lm_add, r_lm_add, c_lm_add], axis=1)
        m_lm_sum = jnp.concatenate(
            [s_lm_sum, r_lm_sum, c_lm_sum], axis=1)
        m_row = jnp.concatenate([s_row, r_row, c_row], axis=1)
        m_len = jnp.concatenate([s_len, r_len, c_len], axis=1)
        m_seqh = jnp.concatenate([s_seqh, r_seqh, c_seqh], axis=1)
        key = m_w * (T + 1) + m_t
        # TPU sorts are the measured round hotspot (an XLA sort of the
        # ~1k-wide merge costs more than the whole seeded scan), so
        # recombination runs as hash scatter-max passes and the trim as
        # approx_max_k — all linear ops.  (An earlier nbest>1 variant
        # sort-admitted `nbest` entries per class plus a COUNT-based
        # anchor cap; the per-class clones it kept re-expanded the same
        # children every round and the clone-filled anchor cap killed
        # the true path's anchor — the round-4 boundary-recovery
        # regression.  Keep-best recombination + the score-based anchor
        # beam serve every nbest; distinct N-best sentences are
        # collected from the NB_SLOTS completion slots.)
        # (a) (word, anchor, prev) class: keep the best entry — for a
        # 2-gram LM that class captures the LM context exactly, so this
        # is the reference's hypothesis recombination done eagerly.
        # EXACT-ENTRY IMMUNITY: entries whose priority is already exact
        # (scanned, m_row >= 0) may only be evicted by other exact
        # entries — a FRESH estimate carries the fmax-charged entry
        # slack (up to ~2lr*fmax optimism on DNN configs), and letting
        # it displace the class's exact truth entry loses that entry's
        # real g for good; the inflated fresh corrects itself at its
        # own scan pop instead (the host's `seen` map admits by exact
        # g value for the same reason, pass2_rescan.py:760)
        DH = 1 << 14
        is_exact = m_row >= 0
        # FRESH entries (not yet scanned) recombine per (word, prev)
        # regardless of anchor: the scan is anchor-independent (full-T
        # seeded Viterbi) and the re-push fans the exact result out to
        # its own best anchors, so keeping one pass-1 anchor variant
        # per (word, prev) is lossless — and it removes the ~8-16
        # identical scans the per-anchor fresh entries used to pay
        key = jnp.where(is_exact, key, m_w * (T + 1) + T)
        prio_ex = jnp.where(is_exact, m_prio, NEG_INF)
        k1 = ((key.astype(jnp.uint32) * jnp.uint32(2654435761))
              ^ (m_prev.astype(jnp.uint32) * jnp.uint32(2246822519))
              ) % jnp.uint32(DH)
        k1 = k1.astype(jnp.int32)
        cb1 = jnp.full((B, DH), NEG_INF, jnp.float32) \
            .at[bvec[:, None], k1].max(m_prio)
        cb1x = jnp.full((B, DH), NEG_INF, jnp.float32) \
            .at[bvec[:, None], k1].max(prio_ex)
        keep = m_prio >= jnp.take_along_axis(cb1, k1, axis=1) - 1e-4
        keep |= is_exact & (
            m_prio >= jnp.take_along_axis(cb1x, k1, axis=1) - 1e-4)
        # (b) (word, prev) anchor beam: boundary variants more than
        # A_BEAM below their class best can never win (the host
        # caps anchors per hypothesis for the same reason); exact
        # entries again measure against exact bests only
        k2 = ((m_w.astype(jnp.uint32) * jnp.uint32(40503))
              ^ (m_prev.astype(jnp.uint32) * jnp.uint32(2654435761))
              ) % jnp.uint32(DH)
        k2 = k2.astype(jnp.int32)
        cb2 = jnp.full((B, DH), NEG_INF, jnp.float32) \
            .at[bvec[:, None], k2].max(m_prio)
        cb2x = jnp.full((B, DH), NEG_INF, jnp.float32) \
            .at[bvec[:, None], k2].max(prio_ex)
        keep &= (m_prio >= jnp.take_along_axis(cb2, k2, axis=1) - 40.0) \
            | (is_exact
               & (m_prio >= jnp.take_along_axis(cb2x, k2, axis=1) - 40.0))
        m_prio = jnp.where(keep, m_prio, NEG_INF)
        ns_prio, sel = jax.lax.approx_max_k(m_prio, S)
        ns_w = jnp.take_along_axis(m_w, sel, axis=1)
        ns_t = jnp.take_along_axis(m_t, sel, axis=1)
        ns_prev = jnp.take_along_axis(m_prev, sel, axis=1)
        ns_parent = jnp.take_along_axis(m_parent, sel, axis=1)
        ns_lm_add = jnp.take_along_axis(m_lm_add, sel, axis=1)
        ns_lm_sum = jnp.take_along_axis(m_lm_sum, sel, axis=1)
        ns_row = jnp.take_along_axis(m_row, sel, axis=1)
        ns_len = jnp.take_along_axis(m_len, sel, axis=1)
        ns_seqh = jnp.take_along_axis(m_seqh, sel, axis=1)

        if _DEBUG:
            for wtrk in _TRACK:
                mtrk = fresh[0] & (pw[0] == wtrk)
                jax.debug.print(
                    "   trk w=" + str(wtrk) +
                    " n={n} t={t} exact={e:.1f} prio={p:.1f}",
                    n=jnp.sum(mtrk),
                    t=jnp.max(jnp.where(mtrk, pt[0], -1)),
                    e=jnp.max(jnp.where(mtrk, exact[0], NEG_INF)),
                    p=jnp.max(jnp.where(mtrk, pprio[0], NEG_INF)))
            tail_child = (c_w == tail) & (c_prio > NEG_HALF)
            jax.debug.print(
                "r={r} top={top:.1f} fresh={f} scanned={s} fin={fin} "
                "exact0={e0:.1f} pw0={w0} pt0={t0} tailc={tc} "
                "tailbest={tb:.1f} cbest={cb:.1f} exp={ex}\n"
                "   stack w={sw} t={st} prio={sp} row={sr}",
                r=round_i, top=ns_prio[0, 0],
                f=jnp.sum(fresh[0]), s=jnp.sum(scanned[0]),
                fin=jnp.sum(is_final[0]), e0=exact[0, 0],
                w0=pw[0, 0], t0=pt[0, 0],
                tc=jnp.sum(tail_child[0]),
                tb=jnp.max(jnp.where(tail_child[0], c_prio[0], NEG_INF)),
                cb=jnp.max(c_prio[0]), ex=jnp.sum(expandable[0]),
                sw=ns_w[0, :10], st=ns_t[0, :10],
                sp=ns_prio[0, :10], sr=ns_row[0, :10])

        # ---- termination bookkeeping (expansions count as the -m pop
        # budget; the exact-scan re-pop is bookkeeping)
        n_pops = n_pops + jnp.sum(scanned, axis=1, dtype=jnp.int32)
        n_res = jnp.sum(res_score > NEG_HALF, axis=1)
        kth = res_score[:, nbest - 1]
        top = jnp.max(m_prio, axis=1)
        done = ((n_res >= nbest) & (top <= kth + 1e-6)) \
            | (top <= NEG_HALF) | (n_pops >= CAPP - P)
        active = active & ~done

        return ((ns_prio, ns_w, ns_t, ns_prev, ns_parent, ns_lm_add,
                 ns_lm_sum, ns_row, ns_len, ns_seqh), g_store, beg_store,
                arena_w, arena_t, arena_parent, arena_lm_sum,
                res_score, res_arena, res_seqh, n_pops, active,
                round_i + 1, env_cnt, env_seen)

    state = jax.lax.while_loop(cond, body, state)
    (_, g_store, beg_store, arena_w, arena_t, arena_parent,
     arena_lm_sum, res_score, res_arena, _rh, n_pops, _, round_i,
     _env, _env2) = state
    return (res_score, res_arena, arena_w, arena_t, arena_parent,
            arena_lm_sum, beg_store, n_pops, round_i)


def run_batch(lattices: List[Optional[TrellisLattice]],
              tabs: DeviceChainTables, ng: DeviceNgram,
              wid2lm: np.ndarray, cprob: Optional[np.ndarray],
              out_ext, strategy, cfg: SearchConfig,
              best_in: Optional[np.ndarray] = None,
              iwcd2=None,
              ) -> List[List[NBestResult]]:
    """Device A* over a whole utterance batch; returns per-utterance
    N-best lists (empty list = pass-1 fallback, like the host path).

    `best_in` is LM-dependent, not batch-dependent — pass the cached
    array (engine._p2d_best_in) to avoid re-walking the whole N-gram
    dict per decode batch."""
    B, T, R = out_ext.shape
    # the device stack holds (hypothesis, boundary-anchor) VARIANTS —
    # up to ~MAX_ANCHORS per sentence hypothesis (the host pushes 8 per
    # expansion) — so -s is scaled x4 to hold comparable hypothesis
    # diversity; at 20k words the raw -s 500 trimmed away truth entries
    # every round (measured: one utterance -466 vs the host's -98, and
    # S=2000 restored exact agreement)
    S = max(64, 4 * int(cfg.stack_size))
    P = POPS
    # arena capacity bounds total pops per utterance (the -m budget,
    # capped so the g/beg stores stay within a few hundred MB)
    capp_mem = max(256, int((MEM_MB << 20)
                            / max(1, B * T * 8)) // P * P)
    CAPP = min(max(P * 32, 2 * int(cfg.max_hypo_pop) // P * P),
               capp_mem)
    max_rounds = CAPP // P
    # per-frame best outprob: the admissible charge for entry-frame
    # slack in the candidate entry bound (cfm)
    fmax = np.asarray(jnp.max(out_ext, axis=2))
    if best_in is None:
        best_in = _best_lm_in(strategy, tabs.loc.shape[0])
    prep = prepare(lattices, T, strategy, cfg, S, cprob, best_in,
                   fmax=fmax)
    if not (prep.last >= 0).any():
        return [[] for _ in range(B)]
    NA = prep.ab.shape[1]
    lr = max(0, int(cfg.lookup_range))
    CA = min((2 * lr + 1) * Q_PER_FRAME, NA)
    CK = min(CHILD_KEEP, CA)
    cprobv = (np.zeros(tabs.loc.shape[0], np.float32) if cprob is None
              else np.append(cprob.astype(np.float32), 0.0))
    if cprob is not None and len(cprobv) < tabs.loc.shape[0]:
        cprobv = np.pad(cprobv, (0, tabs.loc.shape[0] - len(cprobv)))
    wid2lm_v = np.append(wid2lm.astype(np.int32), -1)
    if len(wid2lm_v) < tabs.loc.shape[0]:
        wid2lm_v = np.pad(wid2lm_v, (0, tabs.loc.shape[0] - len(wid2lm_v)),
                          constant_values=-1)
    lm_opt_w = (float(cfg.lm_weight2)
                * best_in[:tabs.loc.shape[0]].astype(np.float32)
                + float(cfg.lm_penalty2)
                + cprobv[:tabs.loc.shape[0]])
    Vp1 = tabs.loc.shape[0]
    strict = iwcd2 is not None and getattr(iwcd2, "n_resolved", 0) > 0
    if strict:
        hs_all, hn_all = iwcd2.head_sidx, iwcd2.head_ns
        lc_all = jnp.asarray(iwcd2.lc_of_word)
    else:
        hs_all = jnp.zeros((1, 1, 1), jnp.int32)
        hn_all = jnp.zeros(1, jnp.int32)
        lc_all = jnp.zeros(1, jnp.int32)
    import time as _time
    _t0 = _time.perf_counter()
    out = _astar_loop(
        tabs.loc, tabs.ent, tabs.ext, tabs.sidx, ng,
        jnp.asarray(wid2lm_v[:Vp1]),
        jnp.asarray(cprobv[:Vp1]),
        jnp.asarray(lm_opt_w.astype(np.float32)),
        out_ext,
        jnp.asarray(prep.ab), jnp.asarray(prep.ae), jnp.asarray(prep.aw),
        jnp.asarray(prep.ainc),
        jnp.asarray(prep.packed),
        jnp.asarray(prep.rest),
        jnp.asarray(np.concatenate(
            [np.zeros((B, 1), np.float32),
             np.cumsum(fmax, axis=1, dtype=np.float32)], axis=1)),
        jnp.asarray(prep.last),
        tuple(jnp.asarray(a) for a in prep.stack0),
        hs_all, hn_all, lc_all,
        P=P, S=S, CA=CA, CK=CK, CAPP=CAPP, max_rounds=max_rounds,
        T=T, lr=lr,
        tail=int(strategy.tail_word),
        nbest=int(min(cfg.nbest, NB_SLOTS)),
        lw2=float(cfg.lm_weight2), pen2=float(cfg.lm_penalty2),
        wb=(int(cfg.word_envelope) if cfg.enveloped else 1 << 30),
        strict_heads=strict)
    (res_score, res_arena, arena_w, arena_t, arena_parent,
     arena_lm_sum, beg_store, n_pops, round_i) = out
    jax.block_until_ready(res_score)
    _t_loop = _time.perf_counter() - _t0
    # profiling hook (tools/profile.py / perf scripts): per-dispatch
    # search statistics of the LAST run_batch call
    LAST_STATS.update(
        rounds=int(round_i), max_rounds=max_rounds, CAPP=CAPP,
        P=P, S=S, CA=CA, CK=CK, B=B, T=T, NA=NA,
        wall_loop=round(_t_loop, 3),
        n_pops=np.asarray(n_pops).tolist())
    res_score = np.asarray(res_score)
    res_arena = np.asarray(res_arena)
    arena_w = np.asarray(arena_w)
    arena_t = np.asarray(arena_t)
    arena_parent = np.asarray(arena_parent)
    arena_lm_sum = np.asarray(arena_lm_sum)

    # reconstruct word sequences; fetch beg rows for the winners only
    chains: List[List[Tuple[int, List[int]]]] = []
    for b in range(B):
        per = []
        for k in range(NB_SLOTS):
            if res_score[b, k] <= NEG_HALF:
                continue
            ai = int(res_arena[b, k])
            idxs = []
            while ai >= 0:
                idxs.append(ai)
                ai = int(arena_parent[b, ai])
            idxs.reverse()
            per.append((k, idxs))
        chains.append(per)
    CAPP_used = arena_w.shape[1]
    rows_flat: List[int] = []
    for b, per in enumerate(chains):
        for _, idxs in per:
            rows_flat.extend(b * CAPP_used + ai for ai in idxs)
    begs = (np.asarray(beg_store[jnp.asarray(rows_flat)])
            if rows_flat else np.zeros((0, T), np.int32))
    pos = 0
    results: List[List[NBestResult]] = []
    for b in range(B):
        per_out: List[NBestResult] = []
        seen_seqs = set()
        lat = lattices[b]
        for k, idxs in chains[b]:
            n = len(idxs)
            rows = begs[pos:pos + n]
            pos += n
            words = [int(arena_w[b, ai]) for ai in idxs]
            seq = tuple(words)
            if seq in seen_seqs or any(w < 0 for w in words):
                continue
            seen_seqs.add(seq)
            Tb = lat.T
            bounds: List[Tuple[int, int]] = []
            e = Tb - 1
            for wi in range(n - 1, -1, -1):
                b0 = int(rows[wi][e]) if e >= 0 else 0
                b0 = max(0, min(b0, e))
                bounds.append((b0, e))
                e = b0 - 1
            bounds.reverse()
            exact = float(res_score[b, k])
            lm_sum = float(arena_lm_sum[b, idxs[-1]])
            per_out.append(NBestResult(
                word_ids=words, score=exact,
                am_score=exact - lm_sum, lm_score=lm_sum,
                bounds=bounds))
        per_out.sort(key=lambda r: -r.score)
        results.append(per_out[:cfg.nbest])
    return results
