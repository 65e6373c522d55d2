"""Device-resident N-gram tables with O(1) hashed lookup.

The reference walks variable-depth back-off chains over mmapped tuple
arrays (`libsent/src/ngram/ngram_access.c` search_ngram, bsearched per
query).  Pointer-chasing and data-dependent depth are hostile to XLA, so
the TPU layout is an open-addressing hash table per order: a probe is a
fixed `MAX_PROBES`-step vectorised loop of gathers, and the back-off walk
is unrolled over the (static) order.  Keys pack (context, word) into
uint32 while n_words <= 65535 (the reference's default unsigned-short
WORD_ID limit, libsent/include/sent/stddefs.h); larger vocabularies
switch to two-column (v, w) keys — the words-int configure flag
equivalent — where a probe gathers [P, 3] rows and compares both key
columns, still a single vectorised gather.

Probabilities stay log10 as in the ARPA file (reference keeps them too).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.io.arpa import NGramLM
from julius_tpu.utils.logadd import LOG_ZERO

MAX_PROBES = 8      # hard bound enforced at build time (table grows until
                    # every linear-probe chain fits) so a lookup is ONE
                    # [.., P] gather + compare, not a sequential loop
EMPTY_KEY = np.uint32(0xFFFFFFFF)


def _hash_u32(k: jnp.ndarray) -> jnp.ndarray:
    """Murmur3-style avalanche on uint32 (good spread for packed ids)."""
    k = k.astype(jnp.uint32)
    k = k ^ (k >> 16)
    k = k * jnp.uint32(0x85EBCA6B)
    k = k ^ (k >> 13)
    k = k * jnp.uint32(0xC2B2AE35)
    k = k ^ (k >> 16)
    return k


def _hash_u32_np(k: np.ndarray) -> np.ndarray:
    """Host mirror of `_hash_u32` (numpy uint32 wrap-around)."""
    k = k.astype(np.uint32).copy()
    k ^= k >> np.uint32(16)
    k *= np.uint32(0x85EBCA6B)
    k ^= k >> np.uint32(13)
    k *= np.uint32(0xC2B2AE35)
    k ^= k >> np.uint32(16)
    return k


GOLDEN = 0x9E3779B1     # pair-mix multiplier (host and device)


def _build_hash(keys: np.ndarray, vals: np.ndarray,
                payload2: np.ndarray = None):
    """Host-side open-addressing insert (linear probing).  Grows the
    table until every probe chain fits in MAX_PROBES so device lookups
    are a single vectorised gather."""
    n = max(16, int(2 ** np.ceil(np.log2(max(1, len(keys)) * 2))))
    h0 = _hash_u32_np(keys)
    while True:
        mask = n - 1
        tk = np.full(n, EMPTY_KEY, dtype=np.uint32)
        tv = np.zeros(n, dtype=np.float32)
        tp = np.zeros(n, dtype=np.float32) if payload2 is not None else None
        ok = True
        for i in range(len(keys)):
            slot = int(h0[i]) & mask
            p = 0
            while tk[slot] != EMPTY_KEY:
                slot = (slot + 1) & mask
                p += 1
                if p >= MAX_PROBES:
                    ok = False
                    break
            if not ok:
                break
            tk[slot] = keys[i]
            tv[slot] = vals[i]
            if tp is not None:
                tp[slot] = payload2[i]
        if ok:
            return tk, tv, tp
        n *= 2


def _build_hash_wide(kv: np.ndarray, kw: np.ndarray, vals: np.ndarray):
    """Two-column (v, w) open-addressing insert for vocabularies past
    the 16-bit packing limit (reference --enable-words-int role); the
    same bounded-probe guarantee as `_build_hash`."""
    n = max(16, int(2 ** np.ceil(np.log2(max(1, len(kv)) * 2))))
    h0 = _hash_u32_np(_hash_u32_np(kv)
                      ^ (kw.astype(np.uint32) * np.uint32(GOLDEN)))
    while True:
        mask = n - 1
        tv_ = np.full(n, EMPTY_KEY, dtype=np.uint32)   # v key column
        tw_ = np.zeros(n, dtype=np.uint32)             # w key column
        tp = np.zeros(n, dtype=np.float32)
        ok = True
        for i in range(len(kv)):
            slot = int(h0[i]) & mask
            p = 0
            while tv_[slot] != EMPTY_KEY:
                slot = (slot + 1) & mask
                p += 1
                if p >= MAX_PROBES:
                    ok = False
                    break
            if not ok:
                break
            tv_[slot] = kv[i]
            tw_[slot] = kw[i]
            tp[slot] = vals[i]
        if ok:
            return tv_, tw_, tp
        n *= 2


@dataclass
class DeviceNgram:
    """Hashed 2-gram (pass-1) tables; higher orders in pass2.py use the
    same hash per order."""

    uni: jnp.ndarray         # [V] log10 P1(w), LOG_ZERO for absent
    bo_uni: jnp.ndarray      # [V] log10 back-off weight of (w)
    bi_keys: jnp.ndarray     # [H] uint32 packed v*V+w (narrow mode)
    bi_vals: jnp.ndarray     # [H] f32 log10 P(w|v)
    # key/value pairs as [H, 2] rows (col 0 = key bits, col 1 = value
    # bits) so a probe is ONE row gather instead of two table gathers —
    # TPU small-gather ops are latency-bound serial loops (~0.13 ms
    # inside a scan step), so halving their count halves that cost.
    # wide mode (V > 65535): [H, 3] rows (v key, w key, value bits)
    bi_rows: jnp.ndarray     # [H, 2] / [H, 3] int32
    n_words: int
    bos_id: int
    eos_id: int
    unk_id: int
    wide: bool = False       # True: two-column (v, w) keys

    def pack(self, v: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        return (v.astype(jnp.uint32) * jnp.uint32(self.n_words)
                + w.astype(jnp.uint32))


jax.tree_util.register_dataclass(
    DeviceNgram,
    data_fields=["uni", "bo_uni", "bi_keys", "bi_vals", "bi_rows"],
    meta_fields=["n_words", "bos_id", "eos_id", "unk_id", "wide"],
)


def _pair_slot(v: jnp.ndarray, w: jnp.ndarray, H: int) -> jnp.ndarray:
    """Device mirror of `_build_hash_wide`'s initial slot."""
    h = _hash_u32(v) ^ (w.astype(jnp.uint32) * jnp.uint32(GOLDEN))
    return _hash_u32(h) & jnp.uint32(H - 1)


def build_device_ngram(lm: NGramLM, force_wide: bool = False) -> DeviceNgram:
    V = lm.n_words
    wide = force_wide or V > 65535
    uni = np.full(V, LOG_ZERO, dtype=np.float32)
    bo = np.zeros(V, dtype=np.float32)
    for (w,), (p, b) in lm.ngrams[0].items():
        uni[w] = p
        bo[w] = b
    if lm.order >= 2 and lm.ngrams[1]:
        items = list(lm.ngrams[1].items())
        ctx = np.asarray([c[0] for c, _ in items], dtype=np.uint32)
        tgt = np.asarray([c[1] for c, _ in items], dtype=np.uint32)
        vals = np.asarray([p for _, (p, _) in items], dtype=np.float32)
    else:
        ctx = np.zeros(0, dtype=np.uint32)
        tgt = np.zeros(0, dtype=np.uint32)
        vals = np.zeros(0, dtype=np.float32)
    if wide:
        tv_, tw_, tp = _build_hash_wide(ctx, tgt, vals)
        rows = np.stack([tv_.view(np.int32), tw_.view(np.int32),
                         tp.view(np.int32)], axis=1)
        tk, tv = tv_, tp
    else:
        keys = ctx * np.uint32(V) + tgt
        tk, tv, _ = _build_hash(keys, vals)
        rows = np.stack([tk.view(np.int32), tv.view(np.int32)], axis=1)
    return DeviceNgram(
        uni=jnp.asarray(uni),
        bo_uni=jnp.asarray(bo),
        bi_keys=jnp.asarray(tk),
        bi_vals=jnp.asarray(tv),
        bi_rows=jnp.asarray(rows),
        n_words=V,
        bos_id=lm.bos_id,
        eos_id=lm.eos_id,
        unk_id=lm.unk_id,
        wide=wide,
    )


def hash_lookup(table_keys: jnp.ndarray, table_vals: jnp.ndarray,
                query: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorised probe: query [...] uint32 -> (found mask, values).

    Probe chains are bounded at build time, so the whole chain is
    fetched with one [..., P] gather and resolved with elementwise
    compares — no sequential loop on device."""
    H = table_keys.shape[0]
    mask = jnp.uint32(H - 1)
    slot = _hash_u32(query) & mask
    idx = (slot[..., None] + jnp.arange(MAX_PROBES, dtype=jnp.uint32)) & mask
    # int32 gather indices: TPU gather lowering is only exercised with
    # signed index types (H < 2^31 always holds — table sizes are 2^k)
    idx = idx.astype(jnp.int32)
    keys = table_keys[idx]                      # [..., P]
    hit = keys == query[..., None]
    found = jnp.any(hit, axis=-1)
    vals = jnp.where(hit, table_vals[idx], 0.0)
    return found, jnp.sum(vals, axis=-1)


def bigram_score_fast(ng: DeviceNgram, v_lm: jnp.ndarray,
                      v_bo: jnp.ndarray, w_lm: jnp.ndarray,
                      uni_w: jnp.ndarray) -> jnp.ndarray:
    """log10 P(w | v) when the caller already holds the per-query
    unigram (`uni_w` = uni[w]) and context back-off (`v_bo` =
    bo_uni[v]): the probe is ONE [.., P, 2] (narrow) / [.., P, 3]
    (wide) row gather with no other table lookups (DeviceNgram.bi_rows)."""
    vq = jnp.maximum(v_lm, 0).astype(jnp.uint32)
    wq = jnp.maximum(w_lm, 0).astype(jnp.uint32)
    H = ng.bi_rows.shape[0]
    if ng.wide:
        slot = _pair_slot(vq, wq, H)
    else:
        key = vq * jnp.uint32(ng.n_words) + wq
        slot = _hash_u32(key) & jnp.uint32(H - 1)
    idx = ((slot[..., None] + jnp.arange(MAX_PROBES, dtype=jnp.uint32))
           & jnp.uint32(H - 1)).astype(jnp.int32)
    rows = ng.bi_rows[idx]                      # [..., P, 2 or 3]
    if ng.wide:
        kv = jax.lax.bitcast_convert_type(rows[..., 0], jnp.uint32)
        kw = jax.lax.bitcast_convert_type(rows[..., 1], jnp.uint32)
        vals = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
        hit = (kv == vq[..., None]) & (kw == wq[..., None])
    else:
        keys = jax.lax.bitcast_convert_type(rows[..., 0], jnp.uint32)
        vals = jax.lax.bitcast_convert_type(rows[..., 1], jnp.float32)
        hit = keys == key[..., None]
    found = jnp.any(hit, axis=-1)
    p = jnp.sum(jnp.where(hit, vals, 0.0), axis=-1)
    out = jnp.where(found, p, v_bo + uni_w)
    return jnp.where(v_lm < 0, uni_w, out)


def bigram_score(ng: DeviceNgram, v: jnp.ndarray,
                 w: jnp.ndarray) -> jnp.ndarray:
    """log10 P(w | v) with Katz back-off (exact 2-gram).

    v, w broadcastable int32 arrays; invalid v (< 0) falls back to
    unigram (used for the start-of-sentence virtual context)."""
    vq = jnp.maximum(v, 0)
    if ng.wide:
        vb, wb = jnp.broadcast_arrays(vq, w)
        return bigram_score_fast(ng, jnp.where(v < 0, -1, vb),
                                 ng.bo_uni[vb], wb, ng.uni[wb])
    key = (vq.astype(jnp.uint32) * jnp.uint32(ng.n_words)
           + w.astype(jnp.uint32))
    found, p = hash_lookup(ng.bi_keys, ng.bi_vals, key)
    backoff = ng.bo_uni[vq] + ng.uni[w]
    out = jnp.where(found, p, backoff)
    return jnp.where(v < 0, ng.uni[w], out)
