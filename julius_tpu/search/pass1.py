"""Pass 1: frame-synchronous Viterbi beam over the flat decode network.

The reference's token-passing core (`libjulius/src/beam.c:2663`
get_back_trellis_proceed: token pools, per-node token maps, heap-based
top-k beam `sort_token_no_order`, cross-word expansion
`beam_inter_word`) is re-designed as a dense `lax.scan` over time:

  * every network node carries a score + payload (LM context word,
    trellis backpointer, word-begin frame) — the "one token per node"
    Viterbi approximation of the reference, made total: there is no
    token allocation because every node always has exactly one slot;
  * the per-frame update is gather(score, in_src) + in_lp, max-reduced
    over the fixed-width incoming-arc axis — no scatter;
  * LM handling: each word's own unigram applies at word entry (tighter
    than the reference's shared-node max-unigram factoring,
    factoring_sub.c:942) and the exact 2-gram correction replaces it at
    word end, exactly like the reference swaps factored scores for real
    2-grams at word ends (beam_inter_word);
  * the word trellis (backtrellis.c TRELLIS_ATOM / BACKTRELLIS) becomes
    a fixed [T, M] tensor of word-end records emitted by the scan;
  * beam pruning maps to an optional score-envelope mask (the rank-based
    beam of the reference exists to bound token-list length, which a
    dense formulation does not have).

Everything is static-shaped; batched decoding is `jax.vmap` over
utterances, which is where the TPU throughput comes from.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.search.network import DecodeNetwork
from julius_tpu.search.ngram_device import (DeviceNgram, bigram_score,
                                            bigram_score_fast)
from julius_tpu.utils.logadd import LOG_ZERO

NEG_HALF = LOG_ZERO / 2


MAX_LOCAL_K = 8     # max arc span for the shift-structured fast path


@dataclass
class DeviceNetwork:
    """Decode network tables on device (pytree).

    Transition layout: left-to-right HMMs allocated sequentially give
    arcs whose span dst - src is in [0, K] for small K, so the per-frame
    Viterbi gather can be replaced with K+1 dense shifted adds
    (`loc_lp[k, i]` = ln p of the arc i-k -> i).  Arbitrary topologies
    fall back to the [N, Din] incoming-arc gather (local_k < 0).
    TPU gathers over the node axis are ~10-40x slower than shifts
    (measured), so the local path is the performance-critical one."""

    score_idx: jnp.ndarray    # [N]
    in_src: jnp.ndarray       # [N, Din]
    in_lp: jnp.ndarray        # [N, Din]
    loc_lp: Optional[jnp.ndarray]  # [K+1, N] shifted-arc scores (local path)
    entry_word: jnp.ndarray   # [N] vocab word id, -1 none
    entry_lp: jnp.ndarray     # [N]
    exit_word: jnp.ndarray    # [N]
    exit_lp: jnp.ndarray      # [N]
    # compressed exit-node view: word ends can only occur at these nodes
    # ([Ex] ~ vocab size, far smaller than N — keeps the per-frame top-k
    # off the full node axis)
    exit_nodes: jnp.ndarray   # [Ex] node ids
    exit_w: jnp.ndarray       # [Ex] vocab word id
    exit_nlp: jnp.ndarray     # [Ex] exit ln p
    # static per-exit lookups folded at build time so the per-frame
    # word-end correction needs no small dynamic gathers (TPU lowers
    # those to serial scalar loops — measured ~0.13 ms each)
    exit_wlm: jnp.ndarray     # [Ex] LM word id of exit_w (-1 none)
    exit_uni: jnp.ndarray     # [Ex] log10 unigram of exit_w (0 if none)
    exit_transp: jnp.ndarray  # [Ex] bool: exit word is transparent
    # per-vocab-word LM context row: (LM id as f32, unigram back-off
    # weight) — one row gather resolves a token's LM context where the
    # naive form needs two serial table gathers
    ctx_info: Optional[jnp.ndarray]          # [V, 2] f32
    word_entry_lm: jnp.ndarray  # [V] lm_weight*log10 uni + penalty at entry
    wid2lm: jnp.ndarray       # [V] vocab word -> LM word id (-1 if no LM)
    transparent: jnp.ndarray  # [V] bool: word passes LM context through
    word_cat: jnp.ndarray     # [V] DFA category id (grammar mode) or 0
    cpair: Optional[jnp.ndarray]  # [C, C] bool category-pair constraint
    cat_init: Optional[jnp.ndarray]   # [C] bool: category allowed initially
    cat_final: Optional[jnp.ndarray]  # [C] bool: word may end the input
    # per-last-word RC triphone assignment for word-head states
    # (reference outprob_style.c:354 AS_RSET dynamic assignment): the
    # node's emission row is substituted by the token's LM-context word
    # class.  None = iwcd1 pseudo-set approximation (the default)
    rc_head: Optional[jnp.ndarray]    # [N] row into rc_sidx, -1 = fixed
    rc_sidx: Optional[jnp.ndarray]    # [NH * C] flattened override rows
    lc_class: Optional[jnp.ndarray]   # [V] word -> left-context class
    head_word: int
    tail_word: int
    local_k: int = -1         # >= 0: use the shift-structured fast path
    rc_C: int = 0             # classes per rc_sidx row


jax.tree_util.register_dataclass(
    DeviceNetwork,
    data_fields=["score_idx", "in_src", "in_lp", "loc_lp",
                 "entry_word", "entry_lp",
                 "exit_word", "exit_lp", "exit_nodes", "exit_w", "exit_nlp",
                 "exit_wlm", "exit_uni", "exit_transp", "ctx_info",
                 "word_entry_lm", "wid2lm", "transparent",
                 "word_cat", "cpair", "cat_init", "cat_final",
                 "rc_head", "rc_sidx", "lc_class"],
    meta_fields=["head_word", "tail_word", "local_k", "rc_C"],
)


def build_device_network(
    net: DecodeNetwork,
    ngram=None,
    wid2lm: Optional[np.ndarray] = None,
    lm_weight: float = 8.0,
    lm_penalty: float = 0.0,
    word_cat: Optional[np.ndarray] = None,
    cpair: Optional[np.ndarray] = None,
    cat_init: Optional[np.ndarray] = None,
    cat_final: Optional[np.ndarray] = None,
    transparent: Optional[np.ndarray] = None,
    transparent_penalty: float = 0.0,
    cprob: Optional[np.ndarray] = None,
    rc_tables=None,
) -> DeviceNetwork:
    V = net.n_words
    if transparent is None:
        transparent = np.zeros(V, dtype=bool)
    pen = np.where(transparent, transparent_penalty, lm_penalty)
    if cprob is not None:
        # class N-gram in-class log10 prob, added unweighted like the
        # reference (beam.c:1729,2450 CLASS_NGRAM)
        pen = pen + np.asarray(cprob, dtype=np.float32)
    if ngram is not None and wid2lm is not None:
        uni = np.asarray(ngram.uni)
        w_lm = np.where(wid2lm >= 0, wid2lm, 0)
        entry = lm_weight * np.where(
            wid2lm >= 0, uni[w_lm], LOG_ZERO) + pen
    else:
        wid2lm = np.full(V, -1, dtype=np.int32)
        entry = pen.astype(np.float32)
    exit_nodes = np.flatnonzero(net.exit_word >= 0).astype(np.int32)
    exit_w_np = net.exit_word[exit_nodes]
    exit_wlm = np.asarray(wid2lm, dtype=np.int32)[exit_w_np]
    if ngram is not None:
        uni_np = np.asarray(ngram.uni)
        exit_uni = np.where(exit_wlm >= 0,
                            uni_np[np.maximum(exit_wlm, 0)],
                            0.0).astype(np.float32)
    else:
        exit_uni = np.zeros(len(exit_nodes), dtype=np.float32)
    exit_transp = np.asarray(transparent, dtype=bool)[exit_w_np]

    # shift-structured transition tables (fast path): valid when every
    # arc has 0 <= dst - src <= MAX_LOCAL_K
    N, Din = net.in_src.shape
    dst = np.tile(np.arange(N, dtype=np.int64)[:, None], (1, Din))
    valid = net.in_lp > (LOG_ZERO / 2)
    span = dst - net.in_src.astype(np.int64)
    loc_lp = None
    local_k = -1
    if valid.any() and np.all(span[valid] >= 0) \
            and np.all(span[valid] <= MAX_LOCAL_K):
        local_k = int(span[valid].max())
        loc = np.full((local_k + 1, N), LOG_ZERO, dtype=np.float32)
        ii, dd = np.nonzero(valid)
        np.maximum.at(loc, (span[ii, dd], ii), net.in_lp[ii, dd])
        loc_lp = jnp.asarray(loc)
    return DeviceNetwork(
        score_idx=jnp.asarray(net.score_idx),
        in_src=jnp.asarray(net.in_src),
        in_lp=jnp.asarray(net.in_lp),
        loc_lp=loc_lp,
        entry_word=jnp.asarray(net.entry_word),
        entry_lp=jnp.asarray(net.entry_lp),
        exit_word=jnp.asarray(net.exit_word),
        exit_lp=jnp.asarray(net.exit_lp),
        exit_nodes=jnp.asarray(exit_nodes),
        exit_w=jnp.asarray(exit_w_np),
        exit_nlp=jnp.asarray(net.exit_lp[exit_nodes]),
        exit_wlm=jnp.asarray(exit_wlm),
        exit_uni=jnp.asarray(exit_uni),
        exit_transp=jnp.asarray(exit_transp),
        ctx_info=(None if ngram is None else jnp.asarray(np.stack([
            np.asarray(wid2lm, np.float32),
            np.where(wid2lm >= 0,
                     np.asarray(ngram.bo_uni)[np.maximum(wid2lm, 0)],
                     0.0).astype(np.float32)], axis=1))),
        word_entry_lm=jnp.asarray(entry, dtype=jnp.float32),
        wid2lm=jnp.asarray(wid2lm, dtype=jnp.int32),
        transparent=jnp.asarray(transparent, dtype=bool),
        word_cat=jnp.asarray(
            word_cat if word_cat is not None else np.zeros(V, np.int32)),
        cpair=None if cpair is None else jnp.asarray(cpair),
        cat_init=None if cat_init is None else jnp.asarray(cat_init),
        cat_final=None if cat_final is None else jnp.asarray(cat_final),
        rc_head=(None if rc_tables is None
                 else jnp.asarray(rc_tables[0])),
        rc_sidx=(None if rc_tables is None
                 else jnp.asarray(rc_tables[1].reshape(-1))),
        lc_class=(None if rc_tables is None
                  else jnp.asarray(rc_tables[2])),
        head_word=net.head_word,
        tail_word=net.tail_word,
        local_k=local_k,
        rc_C=0 if rc_tables is None else int(rc_tables[1].shape[1]),
    )


@dataclass(frozen=True)
class Pass1Config:
    """Static search parameters (reference JCONF_SEARCH pass-1 block)."""

    n_atoms: int = 32           # trellis word-ends kept per frame (M)
    lm_weight: float = 8.0
    lm_penalty: float = 0.0
    beam_width: float = 0.0     # score envelope; 0 = exact dense Viterbi
    use_lm: bool = True         # ngram mode vs grammar/isolated-word
    use_dfa: bool = False       # category-pair constrained cross-word
    crossword: bool = True      # False = isolated word recognition
    # LM factoring at word entry (reference configure --enable-factor1/2):
    # 1 = unigram at entry + exact 2-gram swap at word end (default),
    # 2 = exact 2-gram at entry for the top expand_k contexts (costlier,
    #     context-dependent entry winners like the reference's factor2)
    factoring: int = 1
    expand_k: int = 8
    # tri-state fused-kernel override for this config (None = module
    # FUSE_PASS1 / backend auto).  parallel/mesh.py sets False: a
    # pallas_call cannot be GSPMD-partitioned, so the dp-sharded
    # multi-chip decode stays on the XLA formulation.
    use_pallas: Optional[bool] = None


class Trellis(NamedTuple):
    """[T, M] word-end records (reference TRELLIS_ATOM, trellis.h:28-41)."""

    word: jnp.ndarray    # int32 vocab word id (-1 invalid)
    score: jnp.ndarray   # f32 accumulated Viterbi score at word end
    lm: jnp.ndarray      # f32 LM score of this word (weighted, + penalty)
    prev: jnp.ndarray    # int32 flattened atom id of predecessor word end
    begin: jnp.ndarray   # int32 first frame of the word
    ectx: jnp.ndarray    # int32 effective LM context for what follows
    #                      (the word itself, or — for transparent words —
    #                      the context it inherited; reference transparent
    #                      word handling in beam.c)


class Pass1State(NamedTuple):
    """Per-node token state.  The word-begin frame is NOT carried — it
    is derived from the trellis backpointer (prev // M + 1), since a
    flat atom id encodes its end frame."""

    score: jnp.ndarray   # [N]
    ctx: jnp.ndarray     # [N] int32 previous-word vocab id (-1 none)
    prev: jnp.ndarray    # [N] int32 trellis backpointer
    t: jnp.ndarray       # scalar int32 current frame index


def _word_end_candidates(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
                         cfg: Pass1Config, state: Pass1State):
    """Corrected word-end records from the current node scores.

    Two stages, like the reference's swap of entry-factored unigrams
    for true 2-grams at word ends (beam.c beam_inter_word): the top 2M
    candidates by approximate score get the exact 2-gram correction (a
    handful of hash probes), then are re-ranked to the final M atoms.
    Payload fields are selected with one-hot matmuls instead of small
    dynamic gathers: TPU lowers the latter to serial scalar loops
    (~0.13 ms each) while the MXU selection is exact (one-hot of 1.0s,
    integer fields < 2^24) and takes microseconds.

    (An all-exit correction variant — probing every candidate — was
    measured faster still, but [Ex]-wide hash-table gathers inside the
    scan step reliably fault the v5e backend; see git history.)"""
    M = cfg.n_atoms
    sc_all = state.score[dev.exit_nodes] + dev.exit_nlp      # [Ex]
    Ex = sc_all.shape[0]
    k = min(2 * M, Ex)
    import os as _os
    if Ex > 4 * k and not _os.environ.get("PASS1_EXACT_TOPK"):
        # A/B flag (IMPLEMENTATION.md measured caveats): set
        # PASS1_EXACT_TOPK=1 to force the exact sort and measure the
        # 0.99-recall approximation's accuracy impact
        sc, sel = jax.lax.approx_max_k(sc_all, k, recall_target=0.99)
    else:
        sc, sel = jax.lax.top_k(sc_all, k)
    # stage-1 candidate record (one one-hot matmul for all fields)
    ctx_all = state.ctx[dev.exit_nodes]
    prev_all = state.prev[dev.exit_nodes]
    # transparent words pass their inherited LM context onward
    ectx_all = jnp.where(dev.exit_transp, ctx_all, dev.exit_w)
    f32 = jnp.float32
    rec = jnp.stack([prev_all.astype(f32), ectx_all.astype(f32),
                     dev.exit_w.astype(f32), ctx_all.astype(f32),
                     dev.exit_wlm.astype(f32), dev.exit_uni],
                    axis=-1)                                 # [Ex, 6]
    oh1 = (sel[:, None] ==
           jnp.arange(Ex, dtype=sel.dtype)[None, :])         # [k, Ex]
    # HIGHEST precision: the payload contains integer ids (word ids up
    # to V, trellis backpointers T*M) that a single-pass bf16 MXU
    # contraction would round to 8 mantissa bits — decode word ids came
    # out off-by-a-few at 5k vocab on real TPU before this
    p1_ = jnp.matmul(oh1.astype(f32), rec,
                     precision=jax.lax.Precision.HIGHEST)    # [k, 6]
    prev_k = p1_[:, 0].astype(jnp.int32)
    ectx_k = p1_[:, 1].astype(jnp.int32)
    w_k = p1_[:, 2].astype(jnp.int32)
    ctx_k = p1_[:, 3].astype(jnp.int32)
    wlm_k = p1_[:, 4].astype(jnp.int32)
    uni_k = p1_[:, 5]
    if cfg.use_lm and ngram is not None:
        vrow = dev.ctx_info[jnp.maximum(ctx_k, 0)]           # [k, 2]
        v_lm = jnp.where(ctx_k >= 0,
                         vrow[:, 0].astype(jnp.int32), -1)
        bi = bigram_score_fast(ngram, v_lm, vrow[:, 1],
                               wlm_k, uni_k)
        if cfg.factoring >= 2:
            # entry already applied the exact 2-gram; no swap needed
            delta = jnp.zeros_like(sc)
        else:
            delta = cfg.lm_weight * (bi - uni_k)
            delta = jnp.where(wlm_k >= 0, delta, 0.0)
        lm_sc = jnp.where(
            wlm_k >= 0,
            cfg.lm_weight * bi + cfg.lm_penalty, cfg.lm_penalty)
    else:
        delta = jnp.zeros_like(sc)
        lm_sc = jnp.full_like(sc, cfg.lm_penalty)
    corrected = jnp.where(sc > NEG_HALF, sc + delta, LOG_ZERO)
    m_eff = min(M, k)
    csc, order = jax.lax.top_k(corrected, m_eff)
    rec2 = jnp.stack([lm_sc, prev_k.astype(f32), ectx_k.astype(f32),
                      w_k.astype(f32)], axis=-1)             # [k, 4]
    oh2 = (order[:, None] ==
           jnp.arange(k, dtype=order.dtype)[None, :])        # [m, k]
    p2_ = jnp.matmul(oh2.astype(f32), rec2,
                     precision=jax.lax.Precision.HIGHEST)    # [m, 4]
    lm_sel = p2_[:, 0]
    prev_sel = p2_[:, 1].astype(jnp.int32)
    ectx = p2_[:, 2].astype(jnp.int32)
    w_sel = p2_[:, 3].astype(jnp.int32)
    atoms = Trellis(
        word=jnp.where(csc > NEG_HALF, w_sel, -1),
        score=csc,
        lm=lm_sel,
        prev=prev_sel,
        begin=jnp.where(prev_sel >= 0, prev_sel // M + 1, 0),
        ectx=ectx,
    )
    if m_eff < M:
        pad = M - m_eff
        atoms = Trellis(
            word=jnp.pad(atoms.word, (0, pad), constant_values=-1),
            score=jnp.pad(atoms.score, (0, pad), constant_values=LOG_ZERO),
            lm=jnp.pad(atoms.lm, (0, pad)),
            prev=jnp.pad(atoms.prev, (0, pad), constant_values=-1),
            begin=jnp.pad(atoms.begin, (0, pad)),
            ectx=jnp.pad(atoms.ectx, (0, pad), constant_values=-1),
        )
    return atoms


def _entry_scores(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
                  cfg: Pass1Config, atoms: Trellis,
                  t: jnp.ndarray):
    """Cross-word expansion: per-word entry score + payload.

    N-gram mode: with entry-time unigram factoring the inter-word winner
    is context-independent, so the single best corrected word-end wins
    every entry (identical to the reference's behaviour under 1-gram
    factoring, where the factored value depends only on the target).
    DFA mode: winners differ per category via the category-pair table
    (reference dfa/cpair.c as pass-1 inter-word constraint)."""
    V = dev.word_entry_lm.shape[0]
    valid = atoms.word >= 0
    if cfg.use_dfa and dev.cpair is not None:
        # [K, C] allowed table -> per-category best predecessor
        kcat = dev.word_cat[jnp.maximum(atoms.word, 0)]
        allowed = dev.cpair[kcat]                      # [K, C]
        sc = jnp.where(allowed & valid[:, None],
                       atoms.score[:, None], LOG_ZERO)  # [K, C]
        best_k = jnp.argmax(sc, axis=0)                # [C]
        cat_sc = jnp.max(sc, axis=0)                   # [C]
        wcat = dev.word_cat                            # [V]
        ent = cat_sc[wcat]
        k = best_k[wcat]
        return (ent,
                jnp.maximum(atoms.word[k], 0),
                atoms_prev_flat(atoms, k, t))
    if cfg.use_lm and cfg.factoring >= 2 and ngram is not None:
        # exact 2-gram at entry: per-word winners over the top-K
        # contexts ([K, V] vectorised hash probes)
        K = min(cfg.expand_k, atoms.word.shape[0])
        aw = atoms.ectx[:K]
        asc = jnp.where(valid[:K], atoms.score[:K], LOG_ZERO)
        v_lm = jnp.where(aw >= 0, dev.wid2lm[jnp.maximum(aw, 0)], -1)
        w_lm = dev.wid2lm                                   # [V]
        bi = bigram_score(ngram, v_lm[:, None],
                          jnp.maximum(w_lm, 0)[None, :])    # [K, V]
        uni = ngram.uni[jnp.maximum(w_lm, 0)][None, :]
        # pass1_step adds word_entry_lm = lw*uni + pen at the merge, so
        # the increment here is lw*(bigram - uni)
        sc = asc[:, None] + cfg.lm_weight * (bi - uni)
        sc = jnp.where(w_lm[None, :] >= 0, sc, asc[:, None])
        k_best = jnp.argmax(sc, axis=0)                     # [V]
        ent = jnp.max(sc, axis=0)
        ctx_new = jnp.maximum(aw[k_best], -1)
        prev_new = atoms_prev_flat(atoms, k_best, t)
        return ent, ctx_new, prev_new
    best = jnp.argmax(jnp.where(valid, atoms.score, LOG_ZERO))
    ent = jnp.where(valid[best], atoms.score[best], LOG_ZERO)
    ctx_new = jnp.where(valid[best], atoms.ectx[best], -1)
    prev_new = atoms_prev_flat(atoms, best, t)
    return (jnp.full((V,), ent),
            jnp.full((V,), ctx_new),
            jnp.full((V,), prev_new))


def atoms_prev_flat(atoms: Trellis, k, t):
    """Flattened trellis id of atom slot k ending at frame t-1."""
    M = atoms.word.shape[0]
    return (t - 1) * M + k


def pass1_init(dev: DeviceNetwork, cfg: Pass1Config,
               out_row0: jnp.ndarray) -> Pass1State:
    """Initial state: enter the head silence word only (reference
    init_nodescore beam.c:1552 places the initial token on <s>)."""
    N = dev.score_idx.shape[0]
    if cfg.use_dfa and dev.cat_init is not None:
        ok = dev.cat_init[dev.word_cat[jnp.maximum(dev.entry_word, 0)]]
        enter = (dev.entry_word >= 0) & ok
    elif cfg.crossword:
        enter = dev.entry_word == dev.head_word
    else:
        enter = dev.entry_word >= 0   # isolated word: all words start
    w = jnp.maximum(dev.entry_word, 0)
    score = jnp.where(
        enter,
        dev.entry_lp + dev.word_entry_lm[w] + out_row0[dev.score_idx],
        LOG_ZERO)
    return Pass1State(
        score=score,
        ctx=jnp.full((N,), -1, jnp.int32),
        prev=jnp.full((N,), -1, jnp.int32),
        t=jnp.asarray(0, jnp.int32),
    )


def pass1_step(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
               cfg: Pass1Config, state: Pass1State,
               out_row: jnp.ndarray, frame_valid: jnp.ndarray):
    """One decode_proceed (pass1.c:112): emit word-ends for frame t-1,
    then advance all nodes through frame t."""
    t = state.t + 1
    # word-ends derive from the previous frame; the caller masks them
    # with t-1 < len (see pass1_decode)
    atoms = _word_end_candidates(dev, ngram, cfg, state)

    # in-word propagation
    if dev.local_k >= 0:
        # fast path: K+1 dense shifted adds, no gathers (see
        # DeviceNetwork docstring)
        def shift(x, k, fill):
            if k == 0:
                return x
            return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])

        cands = [shift(state.score, k, LOG_ZERO) + dev.loc_lp[k]
                 for k in range(dev.local_k + 1)]
        inw = cands[0]
        for c in cands[1:]:
            inw = jnp.maximum(inw, c)
        ctx, prev = state.ctx, state.prev
        taken = cands[0] >= inw
        for k in range(1, dev.local_k + 1):
            hit = (cands[k] >= inw) & ~taken
            taken = taken | hit
            ctx = jnp.where(hit, shift(state.ctx, k, -1), ctx)
            prev = jnp.where(hit, shift(state.prev, k, -1), prev)
    else:
        # general topology: gather + max over incoming arcs
        cand = state.score[dev.in_src] + dev.in_lp          # [N, Din]
        best_d = jnp.argmax(cand, axis=1)
        inw = jnp.take_along_axis(cand, best_d[:, None], axis=1)[:, 0]
        src = jnp.take_along_axis(dev.in_src, best_d[:, None], axis=1)[:, 0]
        ctx = state.ctx[src]
        prev = state.prev[src]

    if cfg.crossword:
        ent, ectx, eprev = _entry_scores(dev, ngram, cfg, atoms, t)
        wq = jnp.maximum(dev.entry_word, 0)
        cand_e = jnp.where(
            dev.entry_word >= 0,
            ent[wq] + dev.entry_lp + dev.word_entry_lm[wq],
            LOG_ZERO)
        use_e = cand_e > inw
        merged = jnp.where(use_e, cand_e, inw)
        ctx = jnp.where(use_e, ectx[wq], ctx)
        prev = jnp.where(use_e, eprev[wq], prev)
    else:
        merged = inw

    if dev.rc_head is not None:
        # per-last-word RC word-head triphone assignment (reference
        # outprob_style.c:354): substitute head-state emission rows by
        # the token's context-word class; ctx is the LM context, so a
        # transparent predecessor contributes its inherited context
        cls = jnp.where(ctx >= 0,
                        dev.lc_class[jnp.maximum(ctx, 0)], 0)
        ov = dev.rc_sidx[jnp.maximum(dev.rc_head, 0) * dev.rc_C + cls]
        sidx_eff = jnp.where(dev.rc_head >= 0, ov, dev.score_idx)
    else:
        sidx_eff = dev.score_idx
    new_score = jnp.where(merged > NEG_HALF,
                          merged + out_row[sidx_eff], LOG_ZERO)
    if cfg.beam_width > 0:
        thr = jnp.max(new_score) - cfg.beam_width
        new_score = jnp.where(new_score >= thr, new_score, LOG_ZERO)

    new = Pass1State(score=new_score, ctx=ctx, prev=prev, t=t)
    # freeze past the utterance end (including the frame counter, so
    # absolute trellis ids stay correct for padded streaming blocks)
    keep = lambda a, b: jnp.where(frame_valid, a, b)
    frozen = Pass1State(
        score=keep(new.score, state.score),
        ctx=keep(new.ctx, state.ctx),
        prev=keep(new.prev, state.prev),
        t=keep(t, state.t),
    )
    return frozen, atoms


def pass1_decode(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
                 cfg: Pass1Config, out_ext: jnp.ndarray,
                 n_frames: jnp.ndarray):
    """Decode one utterance: out_ext [T, R] extended outprob rows,
    n_frames valid frame count.  Returns the [T, M] Trellis (atom row t
    holds word-ends at frame t).  vmap over the leading axis for batches.
    Reference: get_back_trellis pass1.c:616."""
    T = out_ext.shape[0]
    state = pass1_init(dev, cfg, out_ext[0])

    def step(state, xs):
        out_row, t = xs
        frame_valid = t < n_frames
        # atoms describe frame t-1, valid while t-1 < n_frames
        nstate, atoms = pass1_step(dev, ngram, cfg, state, out_row,
                                   frame_valid)
        atom_ok = (t - 1 < n_frames) & (atoms.word >= 0)
        atoms = atoms._replace(
            word=jnp.where(atom_ok, atoms.word, -1),
            score=jnp.where(atom_ok, atoms.score, LOG_ZERO))
        return nstate, atoms

    # steps t = 1..T; step T runs on a dummy row (frame_valid False) so
    # word-ends at the final frame are still emitted
    rows = jnp.concatenate([out_ext[1:], jnp.zeros_like(out_ext[:1])])
    ts = jnp.arange(1, T + 1, dtype=jnp.int32)
    _, trellis = jax.lax.scan(step, state, (rows, ts))
    return trellis


#: override for the fused-kernel dispatch: None = auto (TPU only),
#: True = force (uses the Pallas interpreter off-TPU; for tests),
#: False = always use the XLA fallback.
FUSE_PASS1: Optional[bool] = None


def _fused_ok(dev: DeviceNetwork, cfg: Pass1Config) -> bool:
    if cfg.use_pallas is False or FUSE_PASS1 is False:
        return False
    supported = (dev.local_k >= 0 and cfg.crossword and not cfg.use_dfa
                 and not (cfg.use_lm and cfg.factoring >= 2)
                 and cfg.beam_width == 0.0 and dev.rc_head is None)
    if FUSE_PASS1:
        return supported
    try:
        return supported and jax.default_backend() == "tpu"
    except Exception:
        return False


def _scalar_entry_batched(atoms: Trellis, t, M: int):
    """Batched single-best corrected word-end (the factoring=1
    cross-word winner; see _entry_scores): [B] scalars."""
    valid = atoms.word >= 0
    sc = jnp.where(valid, atoms.score, LOG_ZERO)
    best = jnp.argmax(sc, axis=-1)                              # [B]
    # one-hot select instead of take_along_axis (serial scalar loops
    # on TPU); fields exact through the f32 contraction
    oh = (best[:, None] ==
          jnp.arange(sc.shape[-1], dtype=best.dtype)[None, :])
    ohf = oh.astype(jnp.float32)
    bsc = jnp.sum(ohf * sc, axis=-1)
    bectx = jnp.sum(ohf * atoms.ectx.astype(jnp.float32), axis=-1)
    bvalid = jnp.sum(ohf * valid.astype(jnp.float32), axis=-1) > 0.5
    ent = jnp.where(bvalid, bsc, LOG_ZERO)
    ectx = jnp.where(bvalid, bectx, -1).astype(jnp.int32)
    eprev = ((t - 1) * M + best).astype(jnp.int32)
    return ent, ectx, eprev


def _pass1_batch_fused(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
                       cfg: Pass1Config, out_ext: jnp.ndarray,
                       n_frames: jnp.ndarray):
    """Batched decode with the fused Pallas beam-update kernel
    (ops/pass1_kernel.py).  Result-identical to the vmap fallback for
    the supported configuration (asserted by tests)."""
    from julius_tpu.ops import pass1_kernel as pk

    interp = jax.default_backend() != "tpu"
    B, T, R = out_ext.shape
    N = dev.score_idx.shape[0]
    tn = pk.tile_n(B)
    Np = -(-N // tn) * tn
    pad = Np - N
    M = cfg.n_atoms

    loc = jnp.pad(dev.loc_lp, ((0, 0), (0, pad)), constant_values=LOG_ZERO)
    sidx = jnp.pad(dev.score_idx, (0, pad))
    ew = jnp.pad(dev.entry_word, (0, pad), constant_values=-1)
    elp = jnp.pad(dev.entry_lp, (0, pad), constant_values=LOG_ZERO)
    wq = jnp.maximum(ew, 0)
    etot = jnp.where(ew >= 0, elp + dev.word_entry_lm[wq], LOG_ZERO)

    # init = pass1_init on the padded node axis
    enter = ew == dev.head_word
    out0 = jnp.take(out_ext[:, 0], sidx, axis=-1)               # [B, Np]
    score = jnp.where(enter[None, :],
                      etot[None, :] + out0, LOG_ZERO)
    ctx = jnp.full((B, Np), -1, jnp.int32)
    prev = jnp.full((B, Np), -1, jnp.int32)

    rows = jnp.moveaxis(
        jnp.concatenate([out_ext[:, 1:], jnp.zeros_like(out_ext[:, :1])],
                        axis=1), 1, 0)                          # [T, B, R]
    ts = jnp.arange(1, T + 1, dtype=jnp.int32)

    def step(carry, xs):
        sc, cx, pv = carry
        row, t = xs
        frame_valid = t < n_frames                               # [B]
        atoms = jax.vmap(
            lambda s, c, p: _word_end_candidates(
                dev, ngram, cfg, Pass1State(s, c, p, t - 1)))(sc, cx, pv)
        ent_s, ectx_s, eprev_s = _scalar_entry_batched(atoms, t, M)
        out_node = jnp.take(row, sidx, axis=-1)                  # [B, Np]
        nsc, ncx, npv = pk.fused_step(
            sc, cx, pv, loc, etot, out_node,
            ent_s, ectx_s, eprev_s, frame_valid, interpret=interp)
        atom_ok = ((t - 1) < n_frames)[:, None] & (atoms.word >= 0)
        atoms = atoms._replace(
            word=jnp.where(atom_ok, atoms.word, -1),
            score=jnp.where(atom_ok, atoms.score, LOG_ZERO))
        return (nsc, ncx, npv), atoms

    _, trellis = jax.lax.scan(step, (score, ctx, prev), (rows, ts))
    return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, 1), trellis)


def pass1_batch(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
                cfg: Pass1Config, out_ext: jnp.ndarray,
                n_frames: jnp.ndarray):
    """[B, T, R] batched decode -> Trellis of [B, T, M] arrays.

    Dispatches to the fused Pallas kernel path on TPU for the default
    configuration (local-arc network, N-gram factoring=1 / no LM, no
    DFA, no score envelope); everything else uses the vmap'd reference
    formulation."""
    if _fused_ok(dev, cfg):
        return _pass1_batch_fused(dev, ngram, cfg, out_ext, n_frames)
    return jax.vmap(partial(pass1_decode, dev, ngram, cfg))(
        out_ext, n_frames)


def pass1_stream_chunk(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
                       cfg: Pass1Config, state: Pass1State,
                       out_chunk: jnp.ndarray, n_valid: jnp.ndarray):
    """Advance an in-progress pass-1 by one chunk of frames (the
    on-the-fly pipeline of the reference, realtime-1stpass.c
    proceed_one_frame): state carries across chunks; returns the new
    state plus the chunk's trellis atoms ([C, M], atom row i = word-ends
    at absolute frame state.t + i).

    The caller starts a stream with `pass1_init` on the first chunk's
    first row and passes out_chunk[1:] for that first call."""

    def step(st, xs):
        out_row, i = xs
        frame_valid = i < n_valid
        nstate, atoms = pass1_step(dev, ngram, cfg, st, out_row,
                                   frame_valid)
        atom_ok = atoms.word >= 0
        atoms = atoms._replace(
            word=jnp.where(atom_ok, atoms.word, -1))
        return nstate, atoms

    C = out_chunk.shape[0]
    idx = jnp.arange(C, dtype=jnp.int32)
    new_state, atoms = jax.lax.scan(step, state, (out_chunk, idx))
    return new_state, atoms


def pass1_stream_finalize(dev: DeviceNetwork, ngram: Optional[DeviceNgram],
                          cfg: Pass1Config, state: Pass1State):
    """Emit the word-ends at the final frame of a finished stream
    segment (the decode_end flush, pass1.c:457)."""
    return _word_end_candidates(dev, ngram, cfg, state)


def backtrace(trellis, n_frames: int, tail_word: int = -1,
              final_mask: Optional[np.ndarray] = None):
    """Host-side pass-1 result backtrace (reference find_1pass_result
    beam.c:372): best word-end at the final frame, preferring acceptable
    final words (the tail silence word for N-gram, sentence-final
    categories for DFA via final_mask), then follow backpointers."""
    word = np.asarray(trellis.word)
    score = np.asarray(trellis.score)
    prev = np.asarray(trellis.prev)
    begin = np.asarray(trellis.begin)
    lm = np.asarray(trellis.lm)
    T, M = word.shape
    t_last = n_frames - 1
    row_w = word[t_last]
    row_s = score[t_last]
    if final_mask is not None:
        ok = (row_w >= 0) & final_mask[np.maximum(row_w, 0)]
    else:
        ok = row_w == tail_word
    cand = np.where(ok, row_s, -np.inf)
    if np.isfinite(cand).any():
        m = int(np.argmax(cand))
    else:
        valid = np.where(row_w >= 0, row_s, -np.inf)
        if not np.isfinite(valid).any():
            return None
        m = int(np.argmax(valid))
    out = []
    a = t_last * M + m
    total = float(score[t_last, m])
    while a >= 0:
        t, mm = divmod(a, M)
        out.append({
            "word": int(word[t, mm]),
            "begin": int(begin[t, mm]),
            "end": t,
            "score": float(score[t, mm]),
            "lm": float(lm[t, mm]),
        })
        a = int(prev[t, mm])
    out.reverse()
    return {"words": [o["word"] for o in out], "segments": out,
            "score": total}
