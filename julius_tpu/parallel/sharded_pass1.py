"""Sharded pass-1: the decode network partitioned across chips.

SURVEY.md §5.8 mapping: when the lexicon/LM is too big for one chip's
HBM, the reference has no answer (single process); here the node axis
shards over the 'tp' mesh axis with **word-aligned partitions** — words
never span shards, so the shift-structured in-word update needs no halo
exchange at all.  Per frame the only communication is one
`jax.lax.all_gather` of each shard's top word-end candidates (a few
hundred bytes over ICI); the global re-rank, LM correction and entry
computation then run replicated, so every shard derives identical
trellis atoms and entry scores deterministically.

Validated against the single-device decoder bit-for-bit (tests) on the
virtual CPU mesh; the same program runs unchanged on a real TPU slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from julius_tpu.search.network import DecodeNetwork
from julius_tpu.search.ngram_device import DeviceNgram, bigram_score
from julius_tpu.search.pass1 import (MAX_LOCAL_K, NEG_HALF, Pass1Config,
                                     Trellis)
from julius_tpu.utils.logadd import LOG_ZERO


@dataclass
class ShardedNetwork:
    """Stacked per-shard tables ([S, ...] leading shard axis)."""

    score_idx: jnp.ndarray     # [S, Ns]
    loc_lp: jnp.ndarray        # [S, K+1, Ns]
    entry_word: jnp.ndarray    # [S, Ns] global word ids (-1 pad)
    entry_lp: jnp.ndarray      # [S, Ns]
    exit_nodes: jnp.ndarray    # [S, Ex] local node ids (pad 0)
    exit_w: jnp.ndarray        # [S, Ex] global word ids (-1 pad)
    exit_nlp: jnp.ndarray      # [S, Ex] (LOG_ZERO pad)
    word_entry_lm: jnp.ndarray  # [V] replicated
    wid2lm: jnp.ndarray        # [V]
    transparent: jnp.ndarray   # [V]
    head_word: int
    tail_word: int
    n_shards: int
    local_k: int


jax.tree_util.register_dataclass(
    ShardedNetwork,
    data_fields=["score_idx", "loc_lp", "entry_word", "entry_lp",
                 "exit_nodes", "exit_w", "exit_nlp", "word_entry_lm",
                 "wid2lm", "transparent"],
    meta_fields=["head_word", "tail_word", "n_shards", "local_k"],
)


def partition_network(net: DecodeNetwork, dev,
                      n_shards: int) -> ShardedNetwork:
    """Split the flat network into word-aligned contiguous shards.

    `dev` is the single-device DeviceNetwork (for word_entry_lm etc.).
    Requires the local fast path (dev.local_k >= 0)."""
    if dev.local_k < 0:
        raise ValueError("sharded pass-1 needs the local fast path")
    ofs = np.asarray(net.word_node_ofs)
    N = net.n_nodes
    # contiguous word ranges with ~equal node counts
    targets = [round(N * (i + 1) / n_shards) for i in range(n_shards)]
    cuts = [0]
    for tgt in targets[:-1]:
        w = int(np.searchsorted(ofs, tgt))
        w = min(w, len(ofs) - 1)
        cut = max(int(ofs[w]), cuts[-1])    # monotonic, word-aligned
        cuts.append(cut)
    cuts.append(N)
    # node count per shard, padded to the max
    sizes = [cuts[i + 1] - cuts[i] for i in range(n_shards)]
    Ns = max(max(sizes), 1)
    K = dev.local_k
    loc_full = np.asarray(dev.loc_lp)

    s_idx = np.zeros((n_shards, Ns), dtype=np.int32)
    s_loc = np.full((n_shards, K + 1, Ns), LOG_ZERO, dtype=np.float32)
    s_ew = np.full((n_shards, Ns), -1, dtype=np.int32)
    s_el = np.full((n_shards, Ns), LOG_ZERO, dtype=np.float32)
    exit_lists: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for i in range(n_shards):
        a, b = cuts[i], cuts[i + 1]
        n = b - a
        s_idx[i, :n] = net.score_idx[a:b]
        s_loc[i, :, :n] = loc_full[:, a:b]
        # padding nodes must not receive shifted-in scores: rows beyond n
        # already LOG_ZERO; also kill k>0 arcs entering node 0..k-1 from
        # the previous shard's tail (they are word-internal so cannot
        # exist across a word boundary — assert instead)
        for k in range(1, K + 1):
            if n >= k and np.any(s_loc[i, k, :k] > NEG_HALF):
                raise AssertionError("arc crosses word-aligned shard cut")
        s_ew[i, :n] = net.entry_word[a:b]
        s_el[i, :n] = net.entry_lp[a:b]
        ex = np.flatnonzero(net.exit_word[a:b] >= 0).astype(np.int32)
        exit_lists.append((ex, net.exit_word[a:b][ex],
                           net.exit_lp[a:b][ex]))
    Ex = max(max(len(e[0]) for e in exit_lists), 1)
    s_xn = np.zeros((n_shards, Ex), dtype=np.int32)
    s_xw = np.full((n_shards, Ex), -1, dtype=np.int32)
    s_xl = np.full((n_shards, Ex), LOG_ZERO, dtype=np.float32)
    for i, (en, ew, el) in enumerate(exit_lists):
        s_xn[i, : len(en)] = en
        s_xw[i, : len(en)] = ew
        s_xl[i, : len(en)] = el
    return ShardedNetwork(
        score_idx=jnp.asarray(s_idx),
        loc_lp=jnp.asarray(s_loc),
        entry_word=jnp.asarray(s_ew),
        entry_lp=jnp.asarray(s_el),
        exit_nodes=jnp.asarray(s_xn),
        exit_w=jnp.asarray(s_xw),
        exit_nlp=jnp.asarray(s_xl),
        word_entry_lm=dev.word_entry_lm,
        wid2lm=dev.wid2lm,
        transparent=dev.transparent,
        head_word=dev.head_word,
        tail_word=dev.tail_word,
        n_shards=n_shards,
        local_k=dev.local_k,
    )


def _local_step(snet: ShardedNetwork, ngram: Optional[DeviceNgram],
                cfg: Pass1Config, axis: str, state, out_row, frame_valid):
    """One frame on one shard (runs under shard_map)."""
    score, ctx, prev, t = state
    t = t + 1
    M = cfg.n_atoms

    # ---- word-end candidates: exact 2-gram correction on ALL local
    # exits (matching pass1.py _word_end_candidates), local top-M, then
    # one all_gather + global re-rank (the frame's only collective) ----
    cand = score[snet.exit_nodes[0]] + snet.exit_nlp[0]       # [Ex]
    w_all = snet.exit_w[0]
    ctx_all = ctx[snet.exit_nodes[0]]
    prev_all = prev[snet.exit_nodes[0]]
    wq_all = jnp.maximum(w_all, 0)
    if cfg.use_lm and ngram is not None:
        w_lm = jnp.where(w_all >= 0, snet.wid2lm[wq_all], -1)
        v_lm = jnp.where(ctx_all >= 0,
                         snet.wid2lm[jnp.maximum(ctx_all, 0)], -1)
        bi = bigram_score(ngram, v_lm, jnp.maximum(w_lm, 0))
        uni = ngram.uni[jnp.maximum(w_lm, 0)]
        delta = jnp.where(w_lm >= 0, cfg.lm_weight * (bi - uni), 0.0)
        lm_all = jnp.where(w_lm >= 0,
                           cfg.lm_weight * bi + cfg.lm_penalty,
                           cfg.lm_penalty)
    else:
        delta = jnp.zeros_like(cand)
        lm_all = jnp.full_like(cand, cfg.lm_penalty)
    corr = jnp.where(cand > NEG_HALF, cand + delta, LOG_ZERO)
    corr = jnp.where(w_all >= 0, corr, LOG_ZERO)      # pad lanes
    k_loc = min(M, corr.shape[0])
    sc_l, ei_l = jax.lax.top_k(corr, k_loc)
    w_l = w_all[ei_l]
    ctx_l = ctx_all[ei_l]
    prev_l = prev_all[ei_l]
    lm_l = lm_all[ei_l]
    # gather per-shard top-M and re-rank globally
    sc_g = jax.lax.all_gather(sc_l, axis).reshape(-1)
    w_g = jax.lax.all_gather(w_l, axis).reshape(-1)
    ctx_g = jax.lax.all_gather(ctx_l, axis).reshape(-1)
    prev_g = jax.lax.all_gather(prev_l, axis).reshape(-1)
    lm_g = jax.lax.all_gather(lm_l, axis).reshape(-1)

    m_eff = min(M, sc_g.shape[0])
    csc, order = jax.lax.top_k(sc_g, m_eff)
    take = lambda a: a[order]
    prev_sel = take(prev_g)
    w_sel = take(w_g)
    ctx_sel = take(ctx_g)
    lm_sc = take(lm_g)
    ectx = jnp.where(snet.transparent[jnp.maximum(w_sel, 0)],
                     ctx_sel, w_sel)
    pad = M - m_eff
    atoms = Trellis(
        word=jnp.pad(jnp.where(csc > NEG_HALF, w_sel, -1), (0, pad),
                     constant_values=-1),
        score=jnp.pad(csc, (0, pad), constant_values=LOG_ZERO),
        lm=jnp.pad(lm_sc, (0, pad)),
        prev=jnp.pad(prev_sel, (0, pad), constant_values=-1),
        begin=jnp.pad(jnp.where(prev_sel >= 0, prev_sel // M + 1, 0),
                      (0, pad)),
        ectx=jnp.pad(ectx, (0, pad), constant_values=-1),
    )

    # ---- in-word propagation (shard-local shifts) --------------------
    def shift(x, k, fill):
        if k == 0:
            return x
        return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])

    cands = [shift(score, k, LOG_ZERO) + snet.loc_lp[0, k]
             for k in range(snet.local_k + 1)]
    inw = cands[0]
    for c in cands[1:]:
        inw = jnp.maximum(inw, c)
    nctx, nprev = ctx, prev
    taken = cands[0] >= inw
    for k in range(1, snet.local_k + 1):
        hit = (cands[k] >= inw) & ~taken
        taken = taken | hit
        nctx = jnp.where(hit, shift(ctx, k, -1), nctx)
        nprev = jnp.where(hit, shift(prev, k, -1), nprev)

    # ---- cross-word entry (winner identical on every shard) ----------
    valid = atoms.word >= 0
    best = jnp.argmax(jnp.where(valid, atoms.score, LOG_ZERO))
    ent = jnp.where(valid[best], atoms.score[best], LOG_ZERO)
    ectx_new = jnp.where(valid[best], atoms.ectx[best], -1)
    prev_new = (t - 1) * M + best
    ew = snet.entry_word[0]
    wqe = jnp.maximum(ew, 0)
    cand_e = jnp.where(ew >= 0,
                       ent + snet.entry_lp[0] + snet.word_entry_lm[wqe],
                       LOG_ZERO)
    use_e = cand_e > inw
    merged = jnp.where(use_e, cand_e, inw)
    nctx = jnp.where(use_e, ectx_new, nctx)
    nprev = jnp.where(use_e, prev_new, nprev)

    new_score = jnp.where(merged > NEG_HALF,
                          merged + out_row[snet.score_idx[0]], LOG_ZERO)
    keep = lambda a, b: jnp.where(frame_valid, a, b)
    return ((keep(new_score, score), keep(nctx, ctx),
             keep(nprev, prev), keep(t, state[3])), atoms)


def sharded_pass1(mesh: Mesh, snet: ShardedNetwork,
                  ngram: Optional[DeviceNgram], cfg: Pass1Config,
                  out_ext: jnp.ndarray, n_frames) -> Trellis:
    """Decode one utterance with the network sharded over mesh axis
    'tp'.  out_ext: [T, R] replicated score rows."""
    try:
        from jax import shard_map
    except ImportError:                 # older jax
        from jax.experimental.shard_map import shard_map

    axis = "tp"
    Ns = snet.score_idx.shape[1]

    def body(score_idx, loc_lp, entry_word, entry_lp, exit_nodes,
             exit_w, exit_nlp, out_ext, n_frames):
        local = ShardedNetwork(
            score_idx=score_idx, loc_lp=loc_lp, entry_word=entry_word,
            entry_lp=entry_lp, exit_nodes=exit_nodes, exit_w=exit_w,
            exit_nlp=exit_nlp, word_entry_lm=snet.word_entry_lm,
            wid2lm=snet.wid2lm, transparent=snet.transparent,
            head_word=snet.head_word, tail_word=snet.tail_word,
            n_shards=snet.n_shards, local_k=snet.local_k)
        # init: enter the head word on nodes this shard owns
        enter = entry_word[0] == snet.head_word if cfg.crossword \
            else entry_word[0] >= 0
        w0 = jnp.maximum(entry_word[0], 0)
        score0 = jnp.where(
            enter,
            entry_lp[0] + snet.word_entry_lm[w0]
            + out_ext[0][score_idx[0]],
            LOG_ZERO)
        state = (score0,
                 jnp.full((Ns,), -1, jnp.int32),
                 jnp.full((Ns,), -1, jnp.int32),
                 jnp.asarray(0, jnp.int32))

        def step(state, xs):
            out_row, tt = xs
            return _local_step(local, ngram, cfg, axis, state, out_row,
                               tt < n_frames)

        T = out_ext.shape[0]
        rows = jnp.concatenate([out_ext[1:], jnp.zeros_like(out_ext[:1])])
        ts = jnp.arange(1, T + 1, dtype=jnp.int32)
        _, trellis = jax.lax.scan(step, state, (rows, ts))
        atom_ok = (ts - 1 < n_frames)[:, None] & (trellis.word >= 0)
        return trellis._replace(
            word=jnp.where(atom_ok, trellis.word, -1))

    specs = dict(
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P()),
        out_specs=Trellis(*(P() for _ in Trellis._fields)),
    )
    try:
        fn = shard_map(body, check_vma=False, **specs)
    except TypeError:
        fn = shard_map(body, check_rep=False, **specs)
    return fn(snet.score_idx, snet.loc_lp, snet.entry_word,
              snet.entry_lp, snet.exit_nodes, snet.exit_w, snet.exit_nlp,
              out_ext, jnp.asarray(n_frames))
