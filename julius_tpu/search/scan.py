"""Pass-2 acoustic re-scan: batched per-word seeded Viterbi (scan_word).

The reference's second pass re-runs a per-word Viterbi for every
hypothesis expansion against the whole-utterance outprob cache
(`libjulius/src/search_bestfirst_v1.c:589` scan_word, cache kept by
`libsent/src/phmm/outprob.c:184`): a hypothesis carries g[t] — its best
score for every possible boundary frame t — and attaching word w
computes g'[t] = max_tau ( g[tau-1] + Viterbi(w, frames tau..t) ), which
re-derives the word's acoustic score *and* its boundary exactly instead
of freezing both at the pass-1 approximation.

TPU design: one jitted `lax.scan` over frames advances K independent
word chains at once (K = all expansions of one A* round across the
whole utterance batch).  Word chains are slices of the flat decode
network (search/network.py), so in-word arcs have local span
(dst - src <= KL) and the per-frame update is KL+1 dense shifted adds —
the same shift-structured trick as pass 1, no node-axis gathers.  The
entry seeding g[tau-1] folds in as one extra max per frame, and the
entry frame rides along as an argmax payload so boundaries come out of
the same scan.  Everything is static-shaped: K is bucketed, chains are
padded to the vocabulary's longest word.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.search.network import DecodeNetwork
from julius_tpu.utils.logadd import LOG_ZERO

NEG_HALF = LOG_ZERO / 2

#: K buckets for one scan dispatch (pads up; keeps jit cache small)
K_BUCKETS = (16, 64, 256, 1024)

#: frame-window buckets for windowed dispatches (scan_words_store_win);
#: spans past the last bucket scan the full utterance.  Deliberately
#: coarse: each (W, K-bucket) pair is one XLA compile, and fresh-process
#: compiles through the TPU tunnel cost tens of seconds each.
W_BUCKETS = (64, 256)


def bucket_k(k: int) -> int:
    for b in K_BUCKETS:
        if k <= b:
            return b
    return -(-k // K_BUCKETS[-1]) * K_BUCKETS[-1]


def bucket_w(span: int, T: int) -> int:
    """Window bucket covering `span` frames (capped at the utterance)."""
    for b in W_BUCKETS:
        if span <= b:
            return min(b, T)
    return T


class ChainCache:
    """Per-word chain tables sliced from the flat decode network.

    Lazy per word: large vocabularies only pay for words that actually
    appear in a trellis.  All tables are padded to the vocabulary's
    longest word (`nmax` nodes) so one scan dispatch covers any mix."""

    def __init__(self, net: DecodeNetwork):
        self.net = net
        ofs = net.word_node_ofs
        self.nmax = int(np.max(np.diff(ofs))) if len(ofs) > 1 else 1
        # in-word arc span bound (the flat network has no cross-word
        # arcs, so this is exactly pass1's local_k)
        N, Din = net.in_src.shape
        valid = net.in_lp > NEG_HALF
        span = (np.arange(N, dtype=np.int64)[:, None]
                - net.in_src.astype(np.int64))
        if valid.any():
            smax, smin = int(span[valid].max()), int(span[valid].min())
        else:
            smax = smin = 0
        if smin < 0:
            raise ValueError("decode network has backward in-word arcs; "
                             "scan_word requires a left-to-right lexicon")
        self.kl = smax
        self._rows: Dict[int, Tuple[np.ndarray, ...]] = {}

    def _build(self, w: int):
        net = self.net
        n0 = int(net.word_node_ofs[w])
        n1 = int(net.word_node_ofs[w + 1])
        nw = n1 - n0
        nm, kl = self.nmax, self.kl
        loc = np.full((kl + 1, nm), LOG_ZERO, dtype=np.float32)
        src = net.in_src[n0:n1].astype(np.int64) - n0
        lp = net.in_lp[n0:n1]
        dst = np.arange(nw, dtype=np.int64)[:, None]
        ok = lp > NEG_HALF
        ii, dd = np.nonzero(ok)
        np.maximum.at(loc, ((dst - src)[ii, dd], ii), lp[ii, dd])
        ent = np.full(nm, LOG_ZERO, dtype=np.float32)
        ent[:nw] = net.entry_lp[n0:n1]
        ext = np.full(nm, LOG_ZERO, dtype=np.float32)
        ext[:nw] = net.exit_lp[n0:n1]
        sidx = np.zeros(nm, dtype=np.int32)
        sidx[:nw] = net.score_idx[n0:n1]
        return loc, ent, ext, sidx

    def rows(self, word_ids) -> Tuple[np.ndarray, ...]:
        """Stack chain tables for a list of word ids (pad id -1 = dead
        chain that scores LOG_ZERO everywhere)."""
        locs, ents, exts, sidxs = [], [], [], []
        dead = None
        for w in word_ids:
            if w < 0:
                if dead is None:
                    dead = (np.full((self.kl + 1, self.nmax), LOG_ZERO,
                                    np.float32),
                            np.full(self.nmax, LOG_ZERO, np.float32),
                            np.full(self.nmax, LOG_ZERO, np.float32),
                            np.zeros(self.nmax, np.int32))
                r = dead
            else:
                r = self._rows.get(w)
                if r is None:
                    r = self._build(w)
                    self._rows[w] = r
            locs.append(r[0])
            ents.append(r[1])
            exts.append(r[2])
            sidxs.append(r[3])
        return (np.stack(locs), np.stack(ents), np.stack(exts),
                np.stack(sidxs))


class DeviceChainTables:
    """Whole-vocabulary chain tables RESIDENT ON DEVICE (word id V = a
    dead pad chain).  One build, then every scan dispatch gathers its
    K chains on device from int32 word ids — the host never re-uploads
    transition tables (the ChainCache path uploads [K, KL+1, N] floats
    per dispatch, which dominates wall time through a high-latency
    host<->TPU link)."""

    def __init__(self, net: DecodeNetwork):
        self.net = net
        ofs = np.asarray(net.word_node_ofs, dtype=np.int64)
        V = len(ofs) - 1
        self.n_words = V
        nw = np.diff(ofs)
        self.nmax = int(nw.max()) if V else 1
        N, Din = net.in_src.shape
        valid = net.in_lp > NEG_HALF
        span = (np.arange(N, dtype=np.int64)[:, None]
                - net.in_src.astype(np.int64))
        if valid.any():
            if int(span[valid].min()) < 0:
                raise ValueError("decode network has backward in-word "
                                 "arcs; scan_word needs left-to-right")
            self.kl = int(span[valid].max())
        else:
            self.kl = 0
        node_word = np.repeat(np.arange(V, dtype=np.int64), nw)
        local = np.arange(N, dtype=np.int64) - ofs[node_word]
        loc = np.full((V + 1, self.kl + 1, self.nmax), LOG_ZERO,
                      dtype=np.float32)
        ii, dd = np.nonzero(valid)
        np.maximum.at(
            loc, (node_word[ii], span[ii, dd], local[ii]),
            net.in_lp[ii, dd])
        ent = np.full((V + 1, self.nmax), LOG_ZERO, dtype=np.float32)
        ext = np.full((V + 1, self.nmax), LOG_ZERO, dtype=np.float32)
        sidx = np.zeros((V + 1, self.nmax), dtype=np.int32)
        ent[node_word, local] = net.entry_lp
        ext[node_word, local] = net.exit_lp
        sidx[node_word, local] = net.score_idx
        self.loc = jnp.asarray(loc)
        self.ent = jnp.asarray(ent)
        self.ext = jnp.asarray(ext)
        self.sidx = jnp.asarray(sidx)


def _scan_core(loc: jnp.ndarray, ent: jnp.ndarray, ext: jnp.ndarray,
               sidx: jnp.ndarray, seed: jnp.ndarray, bidx: jnp.ndarray,
               out_ext: jnp.ndarray):
    """Shared seeded-Viterbi scan over K word chains (see scan_words)."""
    K, KLp1, N = loc.shape
    B, T, R = out_ext.shape
    gather_idx = bidx[:, None] * R + sidx                     # [K, N]

    def shift(x, k, fill):
        if k == 0:
            return x
        pad = jnp.full((K, k), fill, x.dtype)
        return jnp.concatenate([pad, x[:, :-k]], axis=1)

    def step(carry, xs):
        sc, efr, sv = carry
        seed_t, t = xs
        out_row = jax.lax.dynamic_index_in_dim(out_ext, t, 1,
                                               keepdims=False)  # [B, R]
        outg = out_row.reshape(-1)[gather_idx]                  # [K, N]
        cands = [shift(sc, k, LOG_ZERO) + loc[:, k, :]
                 for k in range(KLp1)]
        mx = cands[0]
        for c in cands[1:]:
            mx = jnp.maximum(mx, c)
        nefr = efr
        nsv = sv
        taken = cands[0] >= mx
        for k in range(1, KLp1):
            hit = (cands[k] >= mx) & ~taken
            taken = taken | hit
            nefr = jnp.where(hit, shift(efr, k, 0), nefr)
            nsv = jnp.where(hit, shift(sv, k, LOG_ZERO), nsv)
        ent_t = seed_t[:, None] + ent                           # [K, N]
        enter = ent_t > mx
        base = jnp.maximum(ent_t, mx)
        nsc = jnp.where(base > NEG_HALF, base + outg, LOG_ZERO)
        nefr = jnp.where(enter, t, nefr)
        # seed value carried along the path: local word score at a
        # candidate end = g[t] - seed_at_entry (pass-2 graph words)
        nsv = jnp.where(enter, seed_t[:, None], nsv)
        endv = jnp.where(nsc > NEG_HALF, nsc + ext, LOG_ZERO)
        an = jnp.argmax(endv, axis=1)
        g_t = jnp.take_along_axis(endv, an[:, None], axis=1)[:, 0]
        b_t = jnp.take_along_axis(nefr, an[:, None], axis=1)[:, 0]
        s_t = jnp.take_along_axis(nsv, an[:, None], axis=1)[:, 0]
        return (nsc, nefr, nsv), (g_t, b_t, s_t)

    sc0 = jnp.full((K, N), LOG_ZERO, jnp.float32)
    efr0 = jnp.zeros((K, N), jnp.int32)
    sv0 = jnp.full((K, N), LOG_ZERO, jnp.float32)
    ts = jnp.arange(T, dtype=jnp.int32)
    _, (g, beg, sv) = jax.lax.scan(step, (sc0, efr0, sv0), (seed.T, ts))
    return g.T, beg.T, sv.T


def scan_words(loc: jnp.ndarray, ent: jnp.ndarray, ext: jnp.ndarray,
               sidx: jnp.ndarray, seed: jnp.ndarray, bidx: jnp.ndarray,
               out_ext: jnp.ndarray):
    """Advance K word chains over the whole utterance in one scan.

    loc   [K, KL+1, N]  shifted in-word arc scores (ln)
    ent   [K, N]        word-entry ln p (LOG_ZERO on non-entry nodes)
    ext   [K, N]        word-exit ln p
    sidx  [K, N]        rows into the extended outprob table
    seed  [K, T]        score available for *entering* at frame t
                        (prev hypothesis score at t-1, LM already added)
    bidx  [K]           utterance index of each chain into out_ext
    out_ext [B, T, R]   whole-batch outprob cache

    Returns (g [K, T], beg [K, T] int32): g[k, t] = best score with the
    word ending exactly at frame t; beg[k, t] = the entry frame of that
    best path (the refined word-begin boundary).
    """
    g, beg, _ = _scan_core(loc, ent, ext, sidx, seed, bidx, out_ext)
    return g, beg


def scan_words_store(g_store: jnp.ndarray, beg_store: jnp.ndarray,
                     loc_all: jnp.ndarray, ent_all: jnp.ndarray,
                     ext_all: jnp.ndarray, sidx_all: jnp.ndarray,
                     wids: jnp.ndarray, parents: jnp.ndarray,
                     lm_adds: jnp.ndarray, bidx: jnp.ndarray,
                     out_rows: jnp.ndarray, anchors: jnp.ndarray,
                     out_ext: jnp.ndarray, scan_beam: float = 0.0):
    """Device-resident A* round: seeds come from stored parent g rows,
    results go back into the store, and only the anchor-frame scores
    return to the host.

    Per-round host<->device traffic is O(K) int32/f32 ids in and
    [K, A] anchor scores out — the full [K, T] g/beg vectors never
    leave HBM (they are only read as the NEXT round's seeds and at
    final backtrace).  This is what makes the reference's
    sequential-looking stack decoding (search_bestfirst_main.c) viable
    behind a high-latency host link.

    g_store/beg_store [CAP, T] (donated); wids/parents/lm_adds/bidx/
    out_rows [K]; anchors [K, A] frame indices; out_ext [B, T, R].
    parents < 0 = word starts the sentence (seed = lm_add at frame 0).
    Returns (g_store', beg_store', ganch, banch, sanch), the last three
    [K, A] at the anchor frames: ganch = g values, banch = refined
    word-begin frames (word-graph begin frames), sanch = the seed value
    carried from the winning entry (so ganch - sanch = the word's local
    AM+LM contribution, used for pass-2 graph word extraction).
    """
    K = wids.shape[0]
    T = g_store.shape[1]
    loc = loc_all[wids]                       # [K, KL+1, N]
    ent = ent_all[wids]
    ext = ext_all[wids]
    sidx = sidx_all[wids]
    pg = g_store[jnp.maximum(parents, 0)]     # [K, T]
    ext_seed = jnp.concatenate(
        [jnp.full((K, 1), LOG_ZERO, jnp.float32), pg[:, :-1]], axis=1) \
        + lm_adds[:, None]
    if scan_beam > 0.0:
        m = jnp.max(ext_seed, axis=1, keepdims=True)
        ext_seed = jnp.where(
            (m > NEG_HALF) & (ext_seed < m - scan_beam),
            LOG_ZERO, ext_seed)
    init_seed = jnp.full((K, T), LOG_ZERO, jnp.float32) \
        .at[:, 0].set(lm_adds)
    seed = jnp.where(parents[:, None] >= 0, ext_seed, init_seed)
    g, beg, sv = _scan_core(loc, ent, ext, sidx, seed, bidx, out_ext)
    g_store = g_store.at[out_rows].set(g)
    beg_store = beg_store.at[out_rows].set(beg)
    ganch = jnp.take_along_axis(g, anchors, axis=1)           # [K, A]
    banch = jnp.take_along_axis(beg, anchors, axis=1)         # [K, A]
    # seed value at the winning entry: local word score for the pass-2
    # word graph = ganch - sanch (graphout.c wordgraph_assign role)
    sanch = jnp.take_along_axis(sv, anchors, axis=1)          # [K, A]
    return g_store, beg_store, ganch, banch, sanch


def _scan_core_win(loc: jnp.ndarray, ent: jnp.ndarray, ext: jnp.ndarray,
                   seed: jnp.ndarray, outw: jnp.ndarray, t0: jnp.ndarray):
    """Windowed seeded-Viterbi: like `_scan_core` but over a W-frame
    window per chain (absolute start frame t0[k]) with the outprob rows
    pre-gathered into `outw [K, W, N]` — the scan body is pure
    shifted-max arithmetic, no gathers (TPU small-gathers inside a scan
    step are latency-bound serial loops; one fused [K, W, N] gather
    before the scan replaces W of them)."""
    K, KLp1, N = loc.shape
    W = seed.shape[1]

    def shift(x, k, fill):
        if k == 0:
            return x
        pad = jnp.full((K, k), fill, x.dtype)
        return jnp.concatenate([pad, x[:, :-k]], axis=1)

    def step(carry, xs):
        sc, efr, sv = carry
        seed_t, out_t, i = xs                    # [K], [K, N], scalar
        t_abs = t0 + i                           # [K] absolute frame
        cands = [shift(sc, k, LOG_ZERO) + loc[:, k, :]
                 for k in range(KLp1)]
        mx = cands[0]
        for c in cands[1:]:
            mx = jnp.maximum(mx, c)
        nefr = efr
        nsv = sv
        taken = cands[0] >= mx
        for k in range(1, KLp1):
            hit = (cands[k] >= mx) & ~taken
            taken = taken | hit
            nefr = jnp.where(hit, shift(efr, k, 0), nefr)
            nsv = jnp.where(hit, shift(sv, k, LOG_ZERO), nsv)
        ent_t = seed_t[:, None] + ent            # [K, N]
        enter = ent_t > mx
        base = jnp.maximum(ent_t, mx)
        nsc = jnp.where(base > NEG_HALF, base + out_t, LOG_ZERO)
        nefr = jnp.where(enter, t_abs[:, None], nefr)
        nsv = jnp.where(enter, seed_t[:, None], nsv)
        endv = jnp.where(nsc > NEG_HALF, nsc + ext, LOG_ZERO)
        an = jnp.argmax(endv, axis=1)
        g_t = jnp.take_along_axis(endv, an[:, None], axis=1)[:, 0]
        b_t = jnp.take_along_axis(nefr, an[:, None], axis=1)[:, 0]
        s_t = jnp.take_along_axis(nsv, an[:, None], axis=1)[:, 0]
        return (nsc, nefr, nsv), (g_t, b_t, s_t)

    sc0 = jnp.full((K, N), LOG_ZERO, jnp.float32)
    efr0 = jnp.zeros((K, N), jnp.int32)
    sv0 = jnp.full((K, N), LOG_ZERO, jnp.float32)
    xs = (seed.T, outw.transpose(1, 0, 2), jnp.arange(W, dtype=jnp.int32))
    _, (g, beg, sv) = jax.lax.scan(step, (sc0, efr0, sv0), xs)
    return g.T, beg.T, sv.T


def scan_words_store_win(g_store: jnp.ndarray, beg_store: jnp.ndarray,
                         loc_all: jnp.ndarray, ent_all: jnp.ndarray,
                         ext_all: jnp.ndarray, sidx_all: jnp.ndarray,
                         ints: jnp.ndarray, lm_adds: jnp.ndarray,
                         out_flat: jnp.ndarray,
                         W: int, T: int, R: int,
                         scan_beam: float = 0.0,
                         head_sidx: Optional[jnp.ndarray] = None,
                         head_ns: Optional[jnp.ndarray] = None):
    """Windowed device-resident A* round (see `scan_words_store`).

    Each chain k scans only frames [t0[k], t0[k] + W): words span ~30
    frames while utterances span hundreds, so clipping the scan to a
    static window around the word's trellis span is a ~T/W device-time
    saving per round (the reference's scan_word walks only the word's
    frames for the same reason, search_bestfirst_v1.c:589).  Callers
    guarantee t0 + W <= T.  anchors are ABSOLUTE frames; anchors outside
    the window return LOG_ZERO.  g/beg rows are written only inside the
    window (rows start LOG_ZERO, so out-of-window frames stay dead).

    All integer per-chain inputs ride in ONE packed upload `ints`
    [K, 6 + A] int32 with columns (wid, parent_row, bidx, out_row, t0,
    lcc, anchors[A]): the host<->TPU tunnel charges per transfer, so
    eight small uploads per chunk would cost more latency than the
    payload (measured 356 chunks x 8 uploads dominating pass-2 wall).

    out_flat = out_ext.reshape(-1) for a [B, T, R] outprob cache.
    Returns (g_store', beg_store', ganch, banch, sanch) like
    `scan_words_store`.
    """
    wids = ints[:, 0]
    parents = ints[:, 1]
    bidx = ints[:, 2]
    out_rows = ints[:, 3]
    t0 = ints[:, 4]
    lcc = ints[:, 5]
    anchors = ints[:, 6:]
    K = wids.shape[0]
    loc = loc_all[wids]
    ent = ent_all[wids]
    ext = ext_all[wids]
    sidx = sidx_all[wids]
    if head_sidx is not None:
        # strict inter-word CD (v2): substitute the head phone's score
        # rows by (word, left-context class) — search/iwcd2.py
        H = head_sidx.shape[-1]
        over = head_sidx[wids, lcc]                           # [K, H]
        jj = jnp.arange(H, dtype=jnp.int32)[None, :]
        over = jnp.where(jj < head_ns[wids][:, None], over, sidx[:, :H])
        sidx = jnp.concatenate([over, sidx[:, H:]], axis=1)
    idx_t = t0[:, None] + jnp.arange(W, dtype=jnp.int32)      # [K, W]
    prow = jnp.maximum(parents, 0)
    pgw = g_store[prow[:, None], jnp.maximum(idx_t - 1, 0)]   # [K, W]
    pgw = jnp.where(idx_t >= 1, pgw, LOG_ZERO)
    ext_seed = pgw + lm_adds[:, None]
    if scan_beam > 0.0:
        m = jnp.max(ext_seed, axis=1, keepdims=True)
        ext_seed = jnp.where(
            (m > NEG_HALF) & (ext_seed < m - scan_beam),
            LOG_ZERO, ext_seed)
    init_seed = jnp.where(idx_t == 0, lm_adds[:, None], LOG_ZERO)
    seed = jnp.where(parents[:, None] >= 0, ext_seed, init_seed)
    flat = (bidx[:, None] * T + idx_t) * R                    # [K, W]
    outw = out_flat[flat[:, :, None] + sidx[:, None, :]]      # [K, W, N]
    g, beg, sv = _scan_core_win(loc, ent, ext, seed, outw, t0)
    # pad chains carry out_rows >= CAP; drop their writes instead of
    # funnelling hundreds of duplicate scatters into a scratch row
    g_store = g_store.at[out_rows[:, None], idx_t].set(g, mode="drop")
    beg_store = beg_store.at[out_rows[:, None], idx_t].set(beg,
                                                           mode="drop")
    rel = jnp.clip(anchors - t0[:, None], 0, W - 1)
    ok = (anchors >= t0[:, None]) & (anchors < t0[:, None] + W)
    ganch = jnp.where(ok, jnp.take_along_axis(g, rel, axis=1), LOG_ZERO)
    banch = jnp.where(ok, jnp.take_along_axis(beg, rel, axis=1), 0)
    sanch = jnp.where(ok, jnp.take_along_axis(sv, rel, axis=1), LOG_ZERO)
    return g_store, beg_store, ganch, banch, sanch


def scan_words_ref(loc: np.ndarray, ent: np.ndarray, ext: np.ndarray,
                   sidx: np.ndarray, seed: np.ndarray,
                   out_rows: np.ndarray):
    """Brute-force numpy reference of `scan_words` for ONE chain
    (tests): out_rows [T, R] for the chain's utterance."""
    KLp1, N = loc.shape
    T = out_rows.shape[0]
    g = np.full(T, LOG_ZERO, np.float32)
    beg = np.zeros(T, np.int32)
    sc = np.full(N, LOG_ZERO, np.float32)
    efr = np.zeros(N, np.int32)
    for t in range(T):
        mx = np.full(N, LOG_ZERO, np.float32)
        src_k = np.zeros(N, np.int64)
        for k in range(KLp1):
            shifted = np.full(N, LOG_ZERO, np.float32)
            if k == 0:
                shifted = sc.copy()
            else:
                shifted[k:] = sc[:-k]
            cand = shifted + loc[k]
            better = cand > mx
            mx = np.where(better, cand, mx)
            src_k = np.where(better, k, src_k)
        nefr = np.zeros(N, np.int32)
        for i in range(N):
            j = i - src_k[i]
            nefr[i] = efr[j] if 0 <= j < N else 0
        ent_t = seed[t] + ent
        enter = ent_t > mx
        base = np.maximum(ent_t, mx)
        outg = out_rows[t][sidx]
        sc = np.where(base > NEG_HALF, base + outg, LOG_ZERO)
        efr = np.where(enter, t, nefr)
        endv = np.where(sc > NEG_HALF, sc + ext, LOG_ZERO)
        an = int(np.argmax(endv))
        g[t] = endv[an]
        beg[t] = efr[an]
    return g, beg
