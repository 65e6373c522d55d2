"""Dense GMM acoustic scoring on the MXU.

Replaces the reference's per-state cached scalar loop
(`libsent/src/phmm/outprob.c:184` outprob_state, `calc_mix.c:41`,
`calc_tied_mix.c:162` with its per-frame codebook caches, and the
`gprune_{safe,beam,heu}.c` Gaussian pruning plugins) with a single dense
formulation:

    log N(x; mu, diag sigma^2)
      = -0.5 * (gconst + sum((x - mu)^2 / sigma^2))
      = c_g + x . a_g - 0.5 * (x*x) . iv_g

with a_g = mu_g * iv_g and c_g = -0.5*(gconst_g + sum(mu_g^2 * iv_g)).
Scoring every Gaussian for a whole batch of frames is therefore two
matmuls [B*T, D] x [D, G] — exactly what the TPU MXU is built for.  All
caching/pruning machinery in the reference exists to *avoid* computing
Gaussians on a scalar CPU; on TPU computing all of them is faster than
branching, so `gprune` maps to an optional top-k mask over the mixture
axis (numerically equivalent to gprune_beam's k-best log-add).

Mixture (senone) scores are a gather of Gaussian rows plus a logsumexp
over the (padded) mixture axis — tied-mixture codebooks fall out as
shared Gaussian indices with no special casing (the per-frame tied-mix
cache of the reference is unnecessary when everything is computed).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from julius_tpu.models.hmm import HMMSet, PseudoPhoneSets
from julius_tpu.utils.logadd import LOG_ZERO


@dataclass
class GMMScorerTables:
    """Device-resident constant tables for dense GMM scoring (pytree)."""

    a: jnp.ndarray          # [D, G] mu * iv, transposed for x @ a
    half_iv: jnp.ndarray    # [D, G] 0.5 * iv, transposed
    c: jnp.ndarray          # [G]    -0.5*(gconst + sum(mu^2 iv))
    state_mix: jnp.ndarray  # [S, M] int32 gaussian ids (pad: 0)
    state_lw: jnp.ndarray   # [S, M] f32 log weights (pad: LOG_ZERO)
    # pseudo-set aggregation (cross-word CD approximation):
    # extended row j in [S, S+Q') aggregates senones members[ofs[j]:ofs[j+1]]
    pseudo_members: Optional[jnp.ndarray] = None   # [L] int32 senone ids
    pseudo_segids: Optional[jnp.ndarray] = None    # [L] int32 set-state row
    n_pseudo: int = 0

    @property
    def n_states(self) -> int:
        return self.state_mix.shape[0]


jax.tree_util.register_dataclass(
    GMMScorerTables,
    data_fields=["a", "half_iv", "c", "state_mix", "state_lw",
                 "pseudo_members", "pseudo_segids"],
    meta_fields=["n_pseudo"],
)


def build_gmm_tables(hmm: HMMSet,
                     pseudo: Optional[PseudoPhoneSets] = None) -> GMMScorerTables:
    iv = hmm.ivars.astype(np.float64)
    mu = hmm.means.astype(np.float64)
    a = (mu * iv).T.astype(np.float32)
    half_iv = (0.5 * iv).T.astype(np.float32)
    c = (-0.5 * (hmm.gconst.astype(np.float64)
                 + np.sum(mu * mu * iv, axis=1))).astype(np.float32)
    mix = np.where(hmm.state_mix >= 0, hmm.state_mix, 0).astype(np.int32)
    tables = GMMScorerTables(
        a=jnp.asarray(a),
        half_iv=jnp.asarray(half_iv),
        c=jnp.asarray(c),
        state_mix=jnp.asarray(mix),
        state_lw=jnp.asarray(hmm.state_lw),
    )
    if pseudo is not None and pseudo.n_set_states > 0:
        segids = np.repeat(
            np.arange(pseudo.n_set_states, dtype=np.int32),
            np.diff(pseudo.member_ofs))
        tables.pseudo_members = jnp.asarray(pseudo.members)
        tables.pseudo_segids = jnp.asarray(segids)
        tables.n_pseudo = pseudo.n_set_states
    return tables


def gauss_scores(tables: GMMScorerTables, x: jnp.ndarray) -> jnp.ndarray:
    """[..., D] frames -> [..., G] per-Gaussian log-likelihoods (two matmuls)."""
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return (dot(x, tables.a) - dot(x * x, tables.half_iv) + tables.c)


def senone_scores(
    tables: GMMScorerTables,
    x: jnp.ndarray,
    topk: int = 0,
    iwcd_scheme: str = "best",
    iwcd_nbest: int = 3,
) -> jnp.ndarray:
    """[..., D] frames -> [..., S(+Q')] senone log output probabilities.

    topk > 0 emulates gprune_beam's k-best Gaussian log-add within each
    mixture (reference gprune_beam.c); 0 sums all mixture components
    exactly (gprune_none/safe semantics — safe's k-best differs only in
    skipped tail mass below f32 epsilon).
    """
    g = gauss_scores(tables, x)                              # [..., G]
    mixed = g[..., tables.state_mix] + tables.state_lw       # [..., S, M]
    if topk and topk < mixed.shape[-1]:
        kth = jax.lax.top_k(mixed, topk)[0][..., -1:]
        mixed = jnp.where(mixed >= kth, mixed, LOG_ZERO)
    out = jax.nn.logsumexp(mixed, axis=-1)                   # [..., S]
    out = jnp.maximum(out, LOG_ZERO)
    if tables.n_pseudo:
        out = jnp.concatenate(
            [out, pseudo_scores(tables, out, iwcd_scheme, iwcd_nbest)],
            axis=-1)
    return out


def aggregate_pseudo(members: jnp.ndarray, segids: jnp.ndarray,
                     n_pseudo: int, senone: jnp.ndarray,
                     scheme: str = "best", nbest: int = 3) -> jnp.ndarray:
    """Aggregate senone scores into pseudo-set-state scores (reference
    outprob_cd, libsent/src/phmm/outprob.c:287-420; scheme selected by
    -iwcd1, default IWCD_NBEST init_phmm.c:74):

      max  — max over member states (outprob_cd_max)
      avg  — arithmetic mean of finite member LOG probs (outprob_cd_avg)
      best — arithmetic mean of the top-nbest LOG probs
             (outprob_cd_nbest; nbest=1 == max)

    senone: [..., S] -> [..., Q'] where Q' = n pseudo set-states.

    The member gather runs in ROW CHUNKS (lax.map): materialising
    [B*T, L] member scores at once is L=126k floats per frame at
    LVCSR scale — 10+ GB for a 64-utterance batch, which OOMed the
    16 GB chip; chunking caps the temp at ~256 MB with no change in
    output (the op is bandwidth-bound either way)."""
    flat_in = senone.reshape(-1, senone.shape[-1])           # [N, S]
    neg_half = LOG_ZERO / 2

    if scheme == "avg":
        def seg(row):
            ok = row > neg_half
            s = jax.ops.segment_sum(jnp.where(ok, row, 0.0), segids,
                                    num_segments=n_pseudo)
            c = jax.ops.segment_sum(ok.astype(row.dtype), segids,
                                    num_segments=n_pseudo)
            return jnp.where(c > 0, s / jnp.maximum(c, 1.0), LOG_ZERO)
    elif scheme == "best" and nbest > 1:
        def seg(row):
            # peel-max: nbest rounds of segment_max, removing each
            # round's winners (exact-tie duplicates collapse — measure
            # zero for continuous scores)
            remaining = row
            s = jnp.zeros(n_pseudo, row.dtype)
            c = jnp.zeros(n_pseudo, row.dtype)
            for _ in range(nbest):
                m = jax.ops.segment_max(remaining, segids,
                                        num_segments=n_pseudo)
                has = m > neg_half
                s = s + jnp.where(has, m, 0.0)
                c = c + has.astype(row.dtype)
                remaining = jnp.where(remaining >= m[segids], LOG_ZERO,
                                      remaining)
            return jnp.where(c > 0, s / jnp.maximum(c, 1.0), LOG_ZERO)
    else:   # "max" (and best-1)
        def seg(row):
            return jax.ops.segment_max(row, segids, num_segments=n_pseudo)

    N = flat_in.shape[0]
    L = int(members.shape[0])
    C = max(1, min(N, (256 << 20) // max(1, 4 * L)))
    pad = (-N) % C
    blocks = jnp.pad(flat_in, ((0, pad), (0, 0))).reshape(-1, C,
                                                          flat_in.shape[-1])
    out = jax.lax.map(
        lambda blk: jax.vmap(seg)(blk[:, members]), blocks)
    out = out.reshape(-1, n_pseudo)[:N]
    return out.reshape(*senone.shape[:-1], n_pseudo)


def pseudo_scores(tables: GMMScorerTables, senone: jnp.ndarray,
                  scheme: str = "best", nbest: int = 3) -> jnp.ndarray:
    return aggregate_pseudo(tables.pseudo_members, tables.pseudo_segids,
                            tables.n_pseudo, senone, scheme, nbest)
