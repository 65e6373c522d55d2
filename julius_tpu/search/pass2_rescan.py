"""Pass 2 with acoustic re-scan: A* stack decoding where every word
extension re-runs the word's Viterbi against the cached outprobs.

This is the parity path for the reference's second pass
(`search_bestfirst_main.c:787` wchmm_fbs loop + `search_bestfirst_v1.c:589`
scan_word): a hypothesis carries its whole g[t] score vector, attaching a
word re-derives the exact acoustic score and the refined word boundary
under the hypothesis's own history, the word envelope bounds pops per
hypothesis length (`search_bestfirst_main.c:847` wb_ok), and `-sb`
(scan_beam) masks entry frames outside the score envelope.

TPU shape: one A* round pops the best few hypotheses of EVERY utterance
in the batch, gathers all their word extensions into one batched
`scan.scan_words` dispatch (K chains x T frames in a single lax.scan),
then pushes the rescored hypotheses back on the per-utterance stacks —
the stack logic stays host-side (it is tiny), the per-frame Viterbi work
rides the device.  The pass-1 trellis supplies next-word candidates
(atoms whose begin frame falls within +-lookup_range of the boundary,
reference `ngram_decode.c:566` ngram_nextwords) and the A* completion
estimate (best pass-1 score ending at the anchor frame).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from julius_tpu.config import SearchConfig
from julius_tpu.search.pass2 import NBestResult, TrellisLattice
from julius_tpu.search.scan import ChainCache, bucket_k, scan_words
from julius_tpu.utils.logadd import LOG_ZERO

NEG_HALF = LOG_ZERO / 2

#: hypotheses popped per utterance per round (device-dispatch batching
#: knob, not a search parameter: results are identical for any value)
POPS_PER_ROUND = 4
#: cap on distinct next words considered per expansion
MAX_NEXT_WORDS = 48
#: cap on boundary-anchor variants pushed per rescored hypothesis (the
#: best few by priority; bounds stack flooding so distinct alternative
#: sequences survive the stack trim)
MAX_ANCHORS = 8
#: failsafe on total scans per utterance
MAX_SCANS = 20000


@dataclass
class RHyp:
    """A sentence prefix with its boundary-resolving score vector."""

    prio: float                    # g[anchor] + pass-1 completion estimate
    atom: int                      # anchor flat atom id (t*M + m)
    words: Tuple[int, ...]
    g: np.ndarray                  # [T] f32, score per candidate end frame
    begs: Tuple[np.ndarray, ...]   # [T] int32 entry frame per end frame
    lm_sum: float
    state: object = None           # DFA reverse-NFA state set (grammar)

    def __lt__(self, other):
        return self.prio > other.prio


class NgramStrategy:
    """Forward N-gram LM scoring + acceptance (host-side probes, so a
    user LM plugs in unchanged)."""

    def __init__(self, lm, wid2lm, cfg: SearchConfig, tail_word: int,
                 transparent=None, cprob=None):
        self.lm, self.wid2lm = lm, wid2lm
        self.lw2, self.pen2 = cfg.lm_weight2, cfg.lm_penalty2
        self.tail_word = tail_word
        self.transparent = transparent
        self.cprob = cprob

    def _pen(self, w: int) -> float:
        return self.pen2 + (float(self.cprob[w])
                            if self.cprob is not None else 0.0)

    def _ctx(self, words: Tuple[int, ...]) -> Tuple[int, ...]:
        need = (self.lm.order - 1) if self.lm is not None else 1
        out = []
        for w in reversed(words):
            if self.transparent is not None and self.transparent[w]:
                continue
            out.append(w)
            if len(out) >= need:
                break
        return tuple(reversed(out))

    def lm_add(self, words: Tuple[int, ...], w: int) -> float:
        if self.lm is None or self.wid2lm is None:
            return self._pen(w)
        wl = int(self.wid2lm[w])
        if wl < 0:
            return self.lw2 * -99.0 + self._pen(w)
        ctx = tuple(int(self.wid2lm[c]) for c in self._ctx(words)
                    if self.wid2lm[c] >= 0)
        return self.lw2 * self.lm.logprob(ctx, wl) + self._pen(w)

    def ctx_key(self, words: Tuple[int, ...]):
        return self._ctx(words)

    def init_state(self):
        return ()

    def step_state(self, state, w: int):
        return state          # always viable (never None)

    def is_final(self, w: int, state) -> bool:
        return w == self.tail_word


class DfaStrategy:
    """DFA grammar acceptance via the reverse-NFA state set
    (reference dfa_decode.c; .dfa follows the reversed-grammar
    convention, io/dfa.py)."""

    def __init__(self, dfa, word_cat: np.ndarray, cfg: SearchConfig):
        self.dfa, self.word_cat = dfa, word_cat
        self.pen2 = cfg.lm_penalty2
        self._cache: Dict[Tuple[frozenset, int], frozenset] = {}

    def lm_add(self, words, w: int) -> float:
        return self.pen2

    def ctx_key(self, words):
        return ()

    def init_state(self):
        return self.dfa.accept_start_set()

    def step_state(self, state, w: int):
        key = (state, int(self.word_cat[w]))
        out = self._cache.get(key)
        if out is None:
            out = self.dfa.reverse_nfa_step(*key)
            self._cache[key] = out
        return out if out else None       # None = dead

    def is_final(self, w: int, state) -> bool:
        return any(self.dfa.initial[s] for s in state)


class ScanDispatcher:
    """Bucketed device dispatch of one round's word extensions."""

    def __init__(self, cache: ChainCache, out_ext, scan_beam: float = 0.0):
        self.cache = cache
        self.out_ext = out_ext                  # [B, T, R] device array
        self.T = int(out_ext.shape[1])
        self.scan_beam = float(scan_beam)
        self.n_scans = 0
        self._jit = jax.jit(scan_words)

    def seed_initial(self, lm_add: float) -> np.ndarray:
        s = np.full(self.T, LOG_ZERO, np.float32)
        s[0] = lm_add
        return s

    def seed_extend(self, g: np.ndarray, lm_add: float) -> np.ndarray:
        s = np.empty(self.T, np.float32)
        s[0] = LOG_ZERO
        s[1:] = g[:-1] + lm_add
        if self.scan_beam > 0.0:
            m = s.max()
            if m > NEG_HALF:
                s = np.where(s >= m - self.scan_beam, s, LOG_ZERO)
        return s

    def run(self, reqs: List[Tuple[int, int, np.ndarray]]):
        """reqs: [(utt_index, word_id, seed[T])] -> (g [K,T], beg [K,T])."""
        out_g, out_b = [], []
        CH = 1024
        for ofs in range(0, len(reqs), CH):
            chunk = reqs[ofs:ofs + CH]
            K = len(chunk)
            Kb = bucket_k(K)
            wids = [r[1] for r in chunk] + [-1] * (Kb - K)
            loc, ent, ext, sidx = self.cache.rows(wids)
            seed = np.full((Kb, self.T), LOG_ZERO, np.float32)
            bidx = np.zeros(Kb, np.int32)
            for i, (b, _w, s) in enumerate(chunk):
                seed[i] = s
                bidx[i] = b
            g, beg = self._jit(
                loc, ent, ext, sidx, seed, bidx, self.out_ext)
            g = np.asarray(g)
            beg = np.asarray(beg)
            out_g.append(g[:K])
            out_b.append(beg[:K])
            self.n_scans += K
        return np.concatenate(out_g), np.concatenate(out_b)


@dataclass
class _UttState:
    lattice: TrellisLattice
    stack: List[RHyp] = field(default_factory=list)
    results: List[NBestResult] = field(default_factory=list)
    seen: Dict = field(default_factory=dict)
    # word envelope: distinct word sequences admitted per length
    # (reference wb_ok, search_bestfirst_main.c:847; counting sequences
    # rather than pops so sibling boundary anchors don't burn the budget)
    len_seen: Dict[int, set] = field(default_factory=dict)
    n_pop: int = 0
    # A* completion estimate: rest[t] = best AM-only trellis
    # continuation covering frames t+1..T-1 (see _suffix_estimate)
    rest: Optional[np.ndarray] = None
    active: bool = True


def _suffix_estimate(lat: TrellisLattice, lr: int) -> np.ndarray:
    """rest[t] = best acoustic-only score of trellis words covering
    frames t+1 .. T-1 (backward DP over pass-1 atoms).

    This is the forward mirror of the reference's completion estimate
    (backtrellis backscores, search.h NODE.score): AM-only keeps it
    optimistic, so the A* never buries a path whose pass-1 LM
    attribution was wrong — exactly the paths the re-scan pass exists
    to recover.  The +-lr window matches the next-word lookup, so any
    anchor the search can extend has a finite estimate."""
    T = lat.T
    rest = np.full(T + 1, -np.inf)
    rest[T - 1] = 0.0            # nothing left after the final frame
    for t in range(T - 2, -1, -1):
        best = -np.inf
        for b in range(max(0, t + 1 - lr), t + 2 + lr):
            for (e, m) in lat.by_begin.get(b, []):
                if e <= t or not np.isfinite(rest[e]):
                    continue
                v = lat.am_of(e, m) + rest[e]
                if v > best:
                    best = v
        rest[t] = best
    return rest[:T]


def _window_atoms(lattice: TrellisLattice, begin_target: int, lr: int):
    """Trellis atoms whose word BEGINS within +-lr of begin_target,
    grouped by word id (reference ngram_nextwords backtrellis window)."""
    by_word: Dict[int, List[Tuple[int, int]]] = {}
    for b in range(max(0, begin_target - lr), begin_target + lr + 1):
        for (t, m) in lattice.by_begin.get(b, []):
            if t < begin_target:      # word must end after the boundary
                continue
            w = int(lattice.word[t, m])
            by_word.setdefault(w, []).append((t, m))
    return by_word


def _cap_words(lattice: TrellisLattice, by_word: Dict, limit: int):
    if len(by_word) <= limit:
        return by_word
    scored = sorted(
        by_word.items(),
        key=lambda kv: -max(float(lattice.score[t, m]) for t, m in kv[1]))
    return dict(scored[:limit])


def rescan_nbest_batch(
    lattices: List[Optional[TrellisLattice]],
    dispatcher: ScanDispatcher,
    strategy,
    cfg: SearchConfig,
) -> List[List[NBestResult]]:
    """Run the rescanned A* for a whole utterance batch in lockstep.

    lattices[b] = None skips utterance b.  Returns per-utterance N-best
    lists (possibly empty = fall back to pass 1)."""
    T_dev = dispatcher.T
    lr = max(0, int(cfg.lookup_range))
    utts: List[Optional[_UttState]] = []
    init_reqs: List[Tuple[int, int, np.ndarray]] = []
    init_meta: List[Tuple[int, int, List[Tuple[int, int]], float, object]] = []
    for b, lat in enumerate(lattices):
        if lat is None or lat.T == 0:
            utts.append(None)
            continue
        if not np.isfinite(
                np.max(np.where(lat.word >= 0, lat.score, -np.inf))):
            utts.append(None)
            continue
        st = _UttState(lattice=lat, rest=_suffix_estimate(lat, lr))
        utts.append(st)
        by_word = _cap_words(lat, _window_atoms(lat, 0, 0), MAX_NEXT_WORDS)
        for w, atom_list in by_word.items():
            state = strategy.step_state(strategy.init_state(), w)
            if state is None:
                continue
            lm = strategy.lm_add((), w)
            init_reqs.append((b, w, dispatcher.seed_initial(lm)))
            init_meta.append((b, w, atom_list, lm, state))

    if init_reqs:
        g_all, beg_all = dispatcher.run(init_reqs)
        for i, (b, w, atom_list, lm, state) in enumerate(init_meta):
            _push_scored(utts[b], RHyp(0.0, 0, (w,), g_all[i],
                                       (beg_all[i],), lm, state),
                         atom_list, cfg,
                         can_final=strategy.is_final(w, state))

    while True:
        reqs: List[Tuple[int, int, np.ndarray]] = []
        meta: List[Tuple[int, RHyp, int, List[Tuple[int, int]],
                         float, object, int]] = []
        req_of: Dict[Tuple[int, int, int], int] = {}
        for b, st in enumerate(utts):
            if st is None or not st.active:
                continue
            lat = st.lattice
            n_popped = 0
            while (st.stack and n_popped < POPS_PER_ROUND and st.active):
                h = heapq.heappop(st.stack)
                # -m counts EXPANDED hypotheses (reference hypo
                # expansion overflow); anchor-duplicate and final pops
                # are bookkeeping, not expansions
                if (st.n_pop >= cfg.max_hypo_pop
                        or dispatcher.n_scans >= MAX_SCANS * len(lattices)):
                    st.active = False
                    break
                t, m = divmod(h.atom, lat.M)
                if (t == lat.T - 1
                        and strategy.is_final(h.words[-1], h.state)
                        and h.g[lat.T - 1] > NEG_HALF):
                    # completion: popped at its own final-frame anchor,
                    # so the A* order reflects the exact full score
                    # (reference ngram/dfa_acceptable); deduped by word
                    # sequence, not by the seen-class below
                    if not any(tuple(r.word_ids) == h.words
                               for r in st.results):
                        st.results.append(_finalize(h, lat.T))
                        if len(st.results) >= cfg.nbest:
                            st.active = False
                    continue
                key = (h.atom, strategy.ctx_key(h.words))
                cnt = st.seen.get(key, 0)
                if cnt >= cfg.nbest:
                    continue
                st.seen[key] = cnt + 1
                if cfg.enveloped:
                    L = len(h.words)
                    s = st.len_seen.setdefault(L, set())
                    if h.words not in s:
                        if len(s) >= cfg.word_envelope:
                            continue
                        s.add(h.words)
                n_popped += 1
                st.n_pop += 1
                by_word = _cap_words(lat, _window_atoms(lat, t + 1, lr),
                                     MAX_NEXT_WORDS)
                for w, atom_list in by_word.items():
                    state = strategy.step_state(h.state, w)
                    if state is None:
                        continue
                    lm = strategy.lm_add(h.words, w)
                    # sibling anchors share g; one scan serves them all
                    rkey = (b, id(h.g), w)
                    ri = req_of.get(rkey)
                    if ri is None:
                        ri = len(reqs)
                        req_of[rkey] = ri
                        reqs.append((b, w,
                                     dispatcher.seed_extend(h.g, lm)))
                    meta.append((b, h, w, atom_list, lm, state, ri))
        if not reqs:
            # no expansions this round; stop only when nothing is left
            # to pop (a round can be all-final or all-dead-end pops)
            if not any(st is not None and st.active and st.stack
                       for st in utts):
                break
            continue
        g_all, beg_all = dispatcher.run(reqs)
        for (b, h, w, atom_list, lm, state, ri) in meta:
            _push_scored(utts[b],
                         RHyp(0.0, 0, h.words + (w,), g_all[ri],
                              h.begs + (beg_all[ri],), h.lm_sum + lm,
                              state),
                         atom_list, cfg,
                         can_final=strategy.is_final(w, state))

    out: List[List[NBestResult]] = []
    for st in utts:
        if st is None:
            out.append([])
        else:
            st.results.sort(key=lambda r: -r.score)
            out.append(st.results[:cfg.nbest])
    return out


def _push_scored(st: _UttState, h: RHyp,
                 atom_list: List[Tuple[int, int]],
                 cfg: SearchConfig, can_final: bool = False) -> None:
    """Push one hypothesis per viable anchor frame (the reference keeps
    a NEXTWORD.tre trellis atom per expansion, ngram_decode.c:566): the
    anchor sets the pass-1 completion estimate AND centres the next
    lookup window, so collapsing anchors would lose continuations whose
    boundary differs from the best-scoring one.  All anchors share the
    same g/beg arrays (one device scan).  can_final adds a final-frame
    anchor (the completion candidate) even when no trellis atom of this
    word ends there."""
    lat = st.lattice
    seen_t = set()
    alist = list(atom_list)
    if can_final and not any(t == lat.T - 1 for (t, m) in alist):
        alist.append((lat.T - 1, 0))
    scored = []
    for (t, m) in alist:
        if t in seen_t:
            continue
        seen_t.add(t)
        gt = float(h.g[t])
        if gt <= NEG_HALF:
            continue
        r = float(st.rest[t])
        if not np.isfinite(r):
            continue
        scored.append((gt + r, t, m))
    scored.sort(reverse=True)
    keep = scored[:MAX_ANCHORS]
    if can_final:
        fin = [s for s in scored if s[1] == lat.T - 1]
        if fin and fin[0] not in keep:
            keep = keep[:-1] + fin      # completion anchor always kept
    for i, (prio, t, m) in enumerate(keep):
        hh = RHyp(prio, t * lat.M + m, h.words, h.g, h.begs,
                  h.lm_sum, h.state) if i else h
        if not i:
            hh.prio, hh.atom = prio, t * lat.M + m
        if len(st.stack) >= cfg.stack_size * 4:
            st.stack.sort()
            del st.stack[cfg.stack_size:]
            heapq.heapify(st.stack)
        heapq.heappush(st.stack, hh)


def _finalize(h: RHyp, T: int) -> NBestResult:
    """Backtrack the refined word boundaries through the beg chain."""
    bounds: List[Tuple[int, int]] = []
    e = T - 1
    exact = float(h.g[e])
    for beg in reversed(h.begs):
        b = int(beg[e]) if e >= 0 else 0
        b = max(0, min(b, e))
        bounds.append((b, e))
        e = b - 1
    bounds.reverse()
    return NBestResult(
        word_ids=list(h.words),
        score=exact,
        am_score=exact - h.lm_sum,
        lm_score=h.lm_sum,
        bounds=bounds,
    )
