"""Fused pass-1 beam-update Pallas kernel.

The per-frame Viterbi update of the dense decoder (search/pass1.py
pass1_step fast path) is HBM-bandwidth-bound: score/ctx/prev are
[B, N] arrays (N ~ 10^5 nodes) and the XLA formulation makes ~8-10
separate passes over them per frame (shifted adds, max chain, payload
selects, entry merge, outprob add, freeze).  This kernel performs the
whole node-domain update in ONE pass: each array is read once from HBM
and the new state written once, cutting per-frame traffic from
~500 MB to ~130 MB at batch 64.

Replaces (capability-wise) the token-push hot loop of the reference
`libjulius/src/beam.c:2663` get_back_trellis_proceed /
beam_intra_word:2154 / beam_inter_word:2271 for the factoring=1 N-gram
configuration; exotic paths (DFA category pairs, exact-bigram entry,
score-envelope beam) stay on the XLA fallback in search/pass1.py.

Shift structure: arcs span dst - src in [0, K] (see
search/pass1.py DeviceNetwork), so the incoming-arc max is K+1 shifted
adds.  Tiles carry a K-column halo from the previous node tile via a
second BlockSpec on the same array (index_map i-1), not a gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from julius_tpu.utils.logadd import LOG_ZERO

NEG_HALF = LOG_ZERO / 2
TILE_N = 1024          # node-axis tile width at batch <= 64


def tile_n(batch: int) -> int:
    """Node-tile width for a given batch size.  ~13 (B, TN) f32/i32
    blocks live in VMEM double-buffered, so B*TN is capped to keep the
    kernel's scoped VMEM under the 16 MB budget."""
    tn = TILE_N
    while batch * tn > 64 * 1024 and tn > 128:
        tn //= 2
    return tn


def _step_kernel(score_c, score_p, ctx_c, ctx_p, prev_c, prev_p,
                 loc, et, out_nd, ents, ectxs, eprevs, fv,
                 o_score, o_ctx, o_prev):
    i = pl.program_id(0)
    first = i == 0
    k1, tn = loc.shape

    s0 = score_c[:]
    inw = s0 + loc[0:1, :]
    ctx = ctx_c[:]
    prev = prev_c[:]
    # running max over shifted arcs; ties keep the smallest k (identical
    # winner to the XLA fallback's global-max + first->=hit rule)
    for k in range(1, k1):
        h_s = jnp.where(first, LOG_ZERO, score_p[:, tn - k:])
        cand = jnp.concatenate([h_s, s0[:, : tn - k]], axis=1) \
            + loc[k:k + 1, :]
        hit = cand > inw
        h_c = jnp.where(first, -1, ctx_p[:, tn - k:])
        h_p = jnp.where(first, -1, prev_p[:, tn - k:])
        ctx = jnp.where(hit, jnp.concatenate(
            [h_c, ctx_c[:, : tn - k]], axis=1), ctx)
        prev = jnp.where(hit, jnp.concatenate(
            [h_p, prev_c[:, : tn - k]], axis=1), prev)
        inw = jnp.maximum(inw, cand)

    # cross-word entry: the factoring=1 winner is one atom per batch row
    # (see pass1.py _entry_scores), so the merge is scalar broadcasts
    et_r = et[0:1, :]
    cand_e = jnp.where(et_r > NEG_HALF, ents[:] + et_r, LOG_ZERO)
    use_e = cand_e > inw
    merged = jnp.where(use_e, cand_e, inw)
    ctx = jnp.where(use_e, ectxs[:], ctx)
    prev = jnp.where(use_e, eprevs[:], prev)

    ns = jnp.where(merged > NEG_HALF, merged + out_nd[:], LOG_ZERO)
    fvb = fv[:] != 0
    o_score[:] = jnp.where(fvb, ns, s0)
    o_ctx[:] = jnp.where(fvb, ctx, ctx_c[:])
    o_prev[:] = jnp.where(fvb, prev, prev_c[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_step(score, ctx, prev, loc_lp, entry_total, out_node,
               ent_s, ectx_s, eprev_s, frame_valid, interpret=False):
    """One fused beam-update frame.

    score/ctx/prev: [B, Np] state (Np multiple of TILE_N);
    loc_lp: [K+1, Np]; entry_total: [Np] (LOG_ZERO = no word entry);
    out_node: [B, Np] this frame's outprob per node;
    ent_s/ectx_s/eprev_s: [B] best corrected word-end score / LM context
    / trellis pointer; frame_valid: [B] bool.
    Returns (new_score, new_ctx, new_prev)."""
    B, Np = score.shape
    tn = tile_n(B)
    if Np % tn:
        raise ValueError(f"node axis {Np} not a multiple of {tn}")
    grid = Np // tn
    k1 = loc_lp.shape[0]

    et2 = entry_total.reshape(1, Np)
    ents = ent_s.reshape(B, 1).astype(jnp.float32)
    ectxs = ectx_s.reshape(B, 1).astype(jnp.int32)
    eprevs = eprev_s.reshape(B, 1).astype(jnp.int32)
    fv = frame_valid.reshape(B, 1).astype(jnp.int32)

    def tile(idx_map):
        return pl.BlockSpec((B, tn), idx_map, memory_space=pltpu.VMEM)

    cur = lambda i: (0, i)
    prv = lambda i: (0, jnp.maximum(i - 1, 0))
    scal = lambda i: (0, 0)

    out_shape = (
        jax.ShapeDtypeStruct((B, Np), jnp.float32),
        jax.ShapeDtypeStruct((B, Np), jnp.int32),
        jax.ShapeDtypeStruct((B, Np), jnp.int32),
    )
    return pl.pallas_call(
        _step_kernel,
        grid=(grid,),
        in_specs=[
            tile(cur), tile(prv),            # score
            tile(cur), tile(prv),            # ctx
            tile(cur), tile(prv),            # prev
            pl.BlockSpec((k1, tn), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), cur, memory_space=pltpu.VMEM),
            tile(cur),                       # out_node
            pl.BlockSpec((B, 1), scal, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), scal, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), scal, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), scal, memory_space=pltpu.VMEM),
        ],
        out_specs=(tile(cur), tile(cur), tile(cur)),
        out_shape=out_shape,
        interpret=interpret,
    )(score, score, ctx, ctx, prev, prev, loc_lp, et2, out_node,
      ents, ectxs, eprevs, fv)
