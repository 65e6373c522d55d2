"""Gaussian Mixture Selection (GMS) scoring.

Reference: `libsent/src/phmm/gms.c` + `gms_gprune.c` and the
`mkgshmm` tool.  A small monophone "GS" model is scored first each
frame; only senones whose corresponding GS state ranks in the top
`gsnum` (reference `-gsnum`, default 24, `libjulius/src/default.c:141`)
get full mixture computation, the rest reuse the GS state score as a
fallback (`gms.c:34-63` doc block; score normalization is compiled out
in the reference, `gms.c:74` NORMALIZE_GS_SCORE undef).

On TPU the dense two-matmul scorer (ops/gmm.py) computes every mixture
faster than data-dependent skipping could, so GMS here is a *semantics*
option, not a speed-up: selected senones score exactly, unselected ones
return the monophone fallback — matching the reference's output values
for configurations that were tuned with GMS on.  Both paths are dense
and the blend is a gather + where, fully fused by XLA.

The senone->GS-state map mirrors `build_state2gs` (`gms.c:120-162`):
each state of every (tri)phone maps to the same state position of the
GS monophone with the matching center name.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.models.hmm import HMMSet, center_name
from julius_tpu.ops.gmm import GMMScorerTables, build_gmm_tables, senone_scores
from julius_tpu.utils.jlog import LogLevel, jlog


@dataclass
class GMSTables:
    """GS scorer + senone->GS-state map (pytree)."""

    gs: GMMScorerTables          # monophone selector model tables
    state2gs: jnp.ndarray        # [S] int32 GS state id, -1 unmapped
    gsnum: int = 24

    @property
    def n_gs_states(self) -> int:
        return self.gs.n_states


jax.tree_util.register_dataclass(
    GMSTables,
    data_fields=["gs", "state2gs"],
    meta_fields=["gsnum"],
)


def build_gms(hmm: HMMSet, gs_hmm: HMMSet, gsnum: int = 24) -> GMSTables:
    """Build GMS tables for `hmm` using the monophone selector model
    `gs_hmm` (the -gshmm file, produced by mkgshmm)."""
    S = hmm.n_states
    state2gs = np.full(S, -1, dtype=np.int32)
    n_miss = 0
    for p, name in enumerate(hmm.phone_names):
        base = center_name(name)
        g = gs_hmm.phone_index.get(base)
        if g is None:
            n_miss += 1
            continue
        gs_states = gs_hmm.phone_states[g][: gs_hmm.phone_ns[g]]
        ns = hmm.phone_ns[p]
        for j in range(ns):
            st = hmm.phone_states[p][j]
            if st < 0:
                continue
            state2gs[st] = gs_states[min(j, len(gs_states) - 1)]
    if n_miss:
        jlog(LogLevel.WARNING,
             f"GMS: {n_miss} phones have no GS monophone; their states "
             "always score fully")
    return GMSTables(
        gs=build_gmm_tables(gs_hmm),
        state2gs=jnp.asarray(state2gs),
        gsnum=gsnum,
    )


def gms_senone_scores(
    tables: GMMScorerTables,
    gms: GMSTables,
    x: jnp.ndarray,
    topk: int = 0,
    iwcd=("best", 3),
) -> jnp.ndarray:
    """[..., D] frames -> [..., S(+Q')] senone scores with GMS mixing.

    Every frame: rank GS states, full-score senones whose GS parent is
    in the top gsnum, give others their GS parent's score (gms.c:42-63).
    Unmapped senones always score fully.  Pseudo-set rows (cross-word CD
    aggregation) are built over the mixed scores, like the reference's
    outprob_cd over GMS-gated outprob_state."""
    import dataclasses

    from julius_tpu.ops.gmm import pseudo_scores

    plain = (tables if not tables.n_pseudo else dataclasses.replace(
        tables, pseudo_members=None, pseudo_segids=None, n_pseudo=0))
    full = senone_scores(plain, x, topk=topk)           # [..., S]
    gs_sc = senone_scores(gms.gs, x)                    # [..., Sg]
    k = min(gms.gsnum, gs_sc.shape[-1])
    kth = jax.lax.top_k(gs_sc, k)[0][..., -1:]
    selected = gs_sc >= kth                             # [..., Sg]
    s2g = jnp.maximum(gms.state2gs, 0)
    mapped = gms.state2gs >= 0
    use_full = jnp.where(mapped, selected[..., s2g], True)
    fallback = gs_sc[..., s2g]
    mixed = jnp.where(use_full, full, fallback)
    if tables.n_pseudo:
        mixed = jnp.concatenate(
            [mixed, pseudo_scores(tables, mixed, *iwcd)], axis=-1)
    return mixed
