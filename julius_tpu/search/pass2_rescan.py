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
`scan.scan_words_store` dispatch (K chains x T frames in a single
lax.scan), then pushes the rescored hypotheses back on the per-utterance
stacks.  The stack logic stays host-side (it is tiny); everything sized
O(T) stays device-resident: chain transition tables live on device for
the whole vocabulary (scan.DeviceChainTables), per-hypothesis g/beg
vectors live in a device row store seeded on device from their parents'
rows, and only the [K, A] anchor-frame scores cross the host link each
round.  The pass-1 trellis supplies next-word candidates (atoms whose
begin frame falls within +-lookup_range of the boundary, reference
`ngram_decode.c:566` ngram_nextwords) and the A* completion estimate
(an AM-only backward DP over the trellis).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.config import SearchConfig
from julius_tpu.search.pass2 import NBestResult, TrellisLattice
from julius_tpu.search.scan import DeviceChainTables, scan_words_store
from julius_tpu.utils.logadd import LOG_ZERO

NEG_HALF = LOG_ZERO / 2

#: hypotheses popped per utterance per round (device-dispatch batching
#: knob: larger = fewer, bigger rounds; the A* is stale-pop tolerant)
POPS_PER_ROUND = 8
#: cap on distinct next words considered per expansion
MAX_NEXT_WORDS = 48
#: cap on boundary-anchor variants pushed per rescored hypothesis (the
#: best few by priority; bounds stack flooding so distinct alternative
#: sequences survive the stack trim)
MAX_ANCHORS = 8
#: anchor-frame slots per scan request (candidate word-end frames whose
#: g values return to the host; union across sibling expansions)
A_CAND = 16
#: failsafe on total scans per utterance
MAX_SCANS = 20000
#: K buckets for one store dispatch (pads up; keeps jit cache small)
K_BUCKETS = (64, 512, 2048)


def _bucket_k(k: int) -> int:
    for b in K_BUCKETS:
        if k <= b:
            return b
    return -(-k // K_BUCKETS[-1]) * K_BUCKETS[-1]


class _RowPool:
    """Host-side free-list over the device row store (row 0 = scratch
    for padded requests; rows are reclaimed by RowHandle GC)."""

    def __init__(self, cap: int):
        self.cap = cap
        self.free = list(range(cap - 1, 0, -1))

    def alloc(self) -> int:
        return self.free.pop()

    def release(self, row: int) -> None:
        self.free.append(row)


class RowHandle:
    """One allocated g/beg row; sibling hypotheses share a handle, GC
    returns the row to the pool when the last reference dies."""

    __slots__ = ("row", "pool")

    def __init__(self, row: int, pool: _RowPool):
        self.row = row
        self.pool = pool

    def __del__(self):
        try:
            self.pool.release(self.row)
        except Exception:
            pass


@dataclass
class RHyp:
    """A sentence prefix anchored at one candidate boundary frame."""

    prio: float                    # g[anchor] + pass-1 completion estimate
    atom: int                      # anchor flat atom id (t*M + m)
    gval: float                    # g[anchor] (exact score at the anchor)
    words: Tuple[int, ...]
    rows: Tuple[RowHandle, ...]    # per-word device g/beg rows (last =
    #                                this hypothesis's own scan result)
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


@dataclass
class _Req:
    """One word-extension scan request (shared by sibling anchors)."""

    b: int
    w: int
    parent: Optional[RowHandle]
    lm_add: float
    anchors: List[int] = field(default_factory=list)
    _aset: set = field(default_factory=set)

    def add_anchors(self, ts) -> None:
        for t in ts:
            if t not in self._aset and len(self.anchors) < A_CAND:
                self._aset.add(t)
                self.anchors.append(t)


class ScanDispatcher:
    """Device-resident dispatch of A* rounds: chain tables + per-
    hypothesis g/beg rows stay in HBM; per round the host uploads K
    (word, parent-row, lm, anchor-frames) tuples and downloads [K, A]
    anchor scores."""

    def __init__(self, tabs: DeviceChainTables, out_ext,
                 scan_beam: float = 0.0, cap: int = 2048):
        self.tabs = tabs
        self.out_ext = out_ext                  # [B, T, R] device array
        self.T = int(out_ext.shape[1])
        self.n_scans = 0
        self.pool = _RowPool(cap)
        self.g_store = jnp.full((cap, self.T), LOG_ZERO, jnp.float32)
        self.beg_store = jnp.zeros((cap, self.T), jnp.int32)
        from functools import partial
        self._fn = jax.jit(partial(scan_words_store,
                                   scan_beam=float(scan_beam)),
                           donate_argnums=(0, 1))

    def _grow(self) -> None:
        cap = self.g_store.shape[0]
        self.g_store = jnp.concatenate(
            [self.g_store,
             jnp.full((cap, self.T), LOG_ZERO, jnp.float32)])
        self.beg_store = jnp.concatenate(
            [self.beg_store, jnp.zeros((cap, self.T), jnp.int32)])
        self.pool.free.extend(range(2 * cap - 1, cap - 1, -1))
        self.pool.cap = 2 * cap

    def run(self, reqs: List[_Req]):
        """Returns (handles, ganch, banch, sanch), the latter three
        [len(reqs), A_CAND]: g / refined-begin / seed-at-entry values at
        each request's anchor frames."""
        handles: List[RowHandle] = []
        ganchs, banchs, sanchs = [], [], []
        dead_w = self.tabs.n_words          # pad chain scores LOG_ZERO
        for ofs in range(0, len(reqs), K_BUCKETS[-1]):
            chunk = reqs[ofs:ofs + K_BUCKETS[-1]]
            K = len(chunk)
            Kb = _bucket_k(K)
            wids = np.full(Kb, dead_w, np.int32)
            parents = np.full(Kb, -1, np.int32)
            lm = np.zeros(Kb, np.float32)
            bidx = np.zeros(Kb, np.int32)
            rows = np.zeros(Kb, np.int32)      # pads write scratch row 0
            anchors = np.zeros((Kb, A_CAND), np.int32)
            chunk_handles = []
            for i, r in enumerate(chunk):
                wids[i] = r.w
                parents[i] = r.parent.row if r.parent is not None else -1
                lm[i] = r.lm_add
                bidx[i] = r.b
                if not self.pool.free:
                    self._grow()
                h = RowHandle(self.pool.alloc(), self.pool)
                chunk_handles.append(h)
                rows[i] = h.row
                if r.anchors:
                    anchors[i, :len(r.anchors)] = r.anchors
            self.g_store, self.beg_store, ganch, banch, sanch = self._fn(
                self.g_store, self.beg_store,
                self.tabs.loc, self.tabs.ent, self.tabs.ext,
                self.tabs.sidx,
                jnp.asarray(wids), jnp.asarray(parents), jnp.asarray(lm),
                jnp.asarray(bidx), jnp.asarray(rows),
                jnp.asarray(anchors), self.out_ext)
            ganchs.append(np.asarray(ganch[:K]))
            banchs.append(np.asarray(banch[:K]))
            sanchs.append(np.asarray(sanch[:K]))
            handles.extend(chunk_handles)
            self.n_scans += K
        if not ganchs:
            z = np.zeros((0, A_CAND), np.float32)
            return handles, z, z.astype(np.int32), z
        return (handles, np.concatenate(ganchs),
                np.concatenate(banchs), np.concatenate(sanchs))

    def fetch_beg(self, row_ids: List[int]) -> np.ndarray:
        """[n, T] beg rows for final backtrace (one gather dispatch)."""
        if not row_ids:
            return np.zeros((0, self.T), np.int32)
        return np.asarray(self.beg_store[jnp.asarray(row_ids)])


@dataclass
class _UttState:
    lattice: TrellisLattice
    stack: List[RHyp] = field(default_factory=list)
    results: List[Tuple[RHyp, float]] = field(default_factory=list)
    seen: Dict = field(default_factory=dict)
    # pass-2 word graph accumulator: (word, begin, end) -> (cum, am, lm)
    # with dynamic merge keeping the best cumulative score (reference
    # wordgraph_assign graphout.c:1901 + merge :2020)
    gwords: Dict = field(default_factory=dict)
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


def _anchor_candidates(lattice: TrellisLattice,
                       atom_list: List[Tuple[int, int]],
                       can_final: bool):
    """Candidate boundary frames for one (hypothesis, word) extension:
    distinct atom end frames ranked by trellis score (the host picks
    candidates BEFORE seeing g; the true g+rest ranking trims them to
    MAX_ANCHORS after the scan returns).  can_final always includes the
    final frame — the completion anchor."""
    best_at: Dict[int, Tuple[float, int]] = {}
    for (t, m) in atom_list:
        s = float(lattice.score[t, m])
        cur = best_at.get(t)
        if cur is None or s > cur[0]:
            best_at[t] = (s, m)
    ts = sorted(best_at, key=lambda t: -best_at[t][0])[:A_CAND]
    t2m = {t: best_at[t][1] for t in ts}
    if can_final and lattice.T - 1 not in t2m:
        if len(ts) >= A_CAND:
            ts = ts[:-1]
        ts.append(lattice.T - 1)
        t2m[lattice.T - 1] = 0
    return ts, t2m


def rescan_nbest_batch(
    lattices: List[Optional[TrellisLattice]],
    dispatcher: ScanDispatcher,
    strategy,
    cfg: SearchConfig,
    graphs: Optional[List] = None,
) -> List[List[NBestResult]]:
    """Run the rescanned A* for a whole utterance batch in lockstep.

    lattices[b] = None skips utterance b.  Returns per-utterance N-best
    lists (possibly empty = fall back to pass 1).  When `graphs` is a
    list, it receives one {(word, begin, end): (cum, am, lm)} dict per
    utterance — the pass-2 word graph accumulated during search
    (reference wordgraph_assign/merge, graphout.c:1901,2020)."""
    lr = max(0, int(cfg.lookup_range))
    utts: List[Optional[_UttState]] = []
    reqs: List[_Req] = []
    req_of: Dict[Tuple[int, int, int], int] = {}
    metas = []   # (b, parent RHyp|None, w, anchor_ts, t2m, lm, state, ri)
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
            can_fin = strategy.is_final(w, state)
            ts, t2m = _anchor_candidates(lat, atom_list, can_fin)
            ri = len(reqs)
            reqs.append(_Req(b, w, None, lm))
            reqs[ri].add_anchors(ts)
            metas.append((b, None, w, ts, t2m, lm, state, ri))

    collect = graphs is not None
    while True:
        if reqs:
            handles, ganch, banch, sanch = dispatcher.run(reqs)
            for (b, parent, w, ts, t2m, lm, state, ri) in metas:
                req = reqs[ri]
                gmap = dict(zip(req.anchors, ganch[ri]))
                h = RHyp(
                    prio=0.0, atom=0, gval=LOG_ZERO,
                    words=(parent.words + (w,)) if parent else (w,),
                    rows=(parent.rows + (handles[ri],)) if parent
                    else (handles[ri],),
                    lm_sum=(parent.lm_sum + lm) if parent else lm,
                    state=state)
                _push_scored(utts[b], h, ts, t2m, gmap, cfg)
            if collect:
                for ri, req in enumerate(reqs):
                    gw = utts[req.b].gwords
                    for ai, t in enumerate(req.anchors):
                        gv = float(ganch[ri][ai])
                        if gv <= NEG_HALF:
                            continue
                        key = (req.w, int(banch[ri][ai]), t)
                        am = gv - float(sanch[ri][ai])
                        cur = gw.get(key)
                        if cur is None or gv > cur[0]:
                            gw[key] = (gv, am, req.lm_add)
        reqs, metas = [], []
        req_of = {}
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
                        and h.gval > NEG_HALF):
                    # completion: popped at its own final-frame anchor,
                    # so the A* order reflects the exact full score
                    # (reference ngram/dfa_acceptable); deduped by word
                    # sequence, not by the seen-class below
                    if not any(r.words == h.words
                               for (r, _) in st.results):
                        st.results.append((h, h.gval))
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
                    can_fin = strategy.is_final(w, state)
                    ts, t2m = _anchor_candidates(lat, atom_list, can_fin)
                    # sibling anchors share the parent's g row; one
                    # scan serves them all (anchor frames are merged)
                    rkey = (b, h.rows[-1].row, w)
                    ri = req_of.get(rkey)
                    if ri is None:
                        ri = len(reqs)
                        req_of[rkey] = ri
                        reqs.append(_Req(b, w, h.rows[-1], lm))
                    reqs[ri].add_anchors(ts)
                    metas.append((b, h, w, ts, t2m, lm, state, ri))
        if not reqs:
            # no expansions this round; stop only when nothing is left
            # to pop (a round can be all-final or all-dead-end pops)
            if not any(st is not None and st.active and st.stack
                       for st in utts):
                break

    if graphs is not None:
        for st in utts:
            graphs.append(st.gwords if st is not None else {})
    return _finalize_all(utts, dispatcher, cfg)


def _push_scored(st: _UttState, h: RHyp, anchor_ts: List[int],
                 t2m: Dict[int, int], gmap: Dict[int, float],
                 cfg: SearchConfig) -> None:
    """Push one hypothesis per viable anchor frame (the reference keeps
    a NEXTWORD.tre trellis atom per expansion, ngram_decode.c:566): the
    anchor sets the pass-1 completion estimate AND centres the next
    lookup window, so collapsing anchors would lose continuations whose
    boundary differs from the best-scoring one.  All anchors share the
    same device g/beg row (one scan)."""
    lat = st.lattice
    scored = []
    for t in anchor_ts:
        gt = float(gmap.get(t, LOG_ZERO))
        if gt <= NEG_HALF:
            continue
        r = float(st.rest[t])
        if not np.isfinite(r):
            continue
        scored.append((gt + r, t))
    scored.sort(reverse=True)
    keep = scored[:MAX_ANCHORS]
    fin = [s for s in scored if s[1] == lat.T - 1]
    if fin and fin[0] not in keep:
        keep = keep[:-1] + fin      # completion anchor always kept
    for i, (prio, t) in enumerate(keep):
        hh = h if i == 0 else RHyp(prio, 0, 0.0, h.words, h.rows,
                                   h.lm_sum, h.state)
        hh.prio = prio
        hh.atom = t * lat.M + t2m[t]
        hh.gval = float(gmap[t])
        if len(st.stack) >= cfg.stack_size * 4:
            st.stack.sort()
            del st.stack[cfg.stack_size:]
            heapq.heapify(st.stack)
        heapq.heappush(st.stack, hh)


def _finalize_all(utts: List[Optional[_UttState]],
                  dispatcher: ScanDispatcher,
                  cfg: SearchConfig) -> List[List[NBestResult]]:
    """Backtrack refined word boundaries through the device beg rows —
    one batched fetch for every completed hypothesis of every
    utterance."""
    want: List[int] = []
    for st in utts:
        if st is None:
            continue
        for (h, _) in st.results:
            want.extend(hd.row for hd in h.rows)
    begs = dispatcher.fetch_beg(want)
    pos = 0
    out: List[List[NBestResult]] = []
    for st in utts:
        if st is None:
            out.append([])
            continue
        results = []
        for (h, exact) in st.results:
            n = len(h.rows)
            rows = begs[pos:pos + n]
            pos += n
            T = st.lattice.T
            bounds: List[Tuple[int, int]] = []
            e = T - 1
            for wi in range(n - 1, -1, -1):
                b0 = int(rows[wi][e]) if e >= 0 else 0
                b0 = max(0, min(b0, e))
                bounds.append((b0, e))
                e = b0 - 1
            bounds.reverse()
            results.append(NBestResult(
                word_ids=list(h.words),
                score=exact,
                am_score=exact - h.lm_sum,
                lm_score=h.lm_sum,
                bounds=bounds,
            ))
        results.sort(key=lambda r: -r.score)
        out.append(results[:cfg.nbest])
    return out
