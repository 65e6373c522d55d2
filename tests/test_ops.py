"""Numeric tests for the dense acoustic scorers against naive references."""

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.io.dnn import DNNParams
from julius_tpu.models.hmm import build_pseudo_sets
from julius_tpu.ops.gmm import (build_gmm_tables, gauss_scores,
                                senone_scores)
from julius_tpu.ops.dnn import build_dnn_scorer, dnn_scores
from julius_tpu.utils.logadd import LOG_ZERO, logsumexp_np

from fixtures import make_hmmdefs_text


def naive_gauss(hmm, x):
    # log N(x) per gaussian, straight from the definition
    d2 = np.sum((x[:, None, :] - hmm.means[None]) ** 2 * hmm.ivars[None],
                axis=-1)
    return -0.5 * (hmm.gconst[None] + d2)


def naive_senone(hmm, x):
    g = naive_gauss(hmm, x)                       # [T, G]
    S, M = hmm.state_mix.shape
    out = np.full((x.shape[0], S), LOG_ZERO, dtype=np.float64)
    for s in range(S):
        for t in range(x.shape[0]):
            acc = []
            for m in range(M):
                gid = hmm.state_mix[s, m]
                if gid >= 0:
                    acc.append(hmm.state_lw[s, m] + g[t, gid])
            out[t, s] = logsumexp_np(np.asarray(acc))
    return out


@pytest.fixture(scope="module")
def hmm():
    return parse_hmmdefs_text(make_hmmdefs_text(n_mix=3))


def test_gauss_scores_match_definition(hmm):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((7, hmm.dim)).astype(np.float32)
    tables = build_gmm_tables(hmm)
    got = np.asarray(gauss_scores(tables, jnp.asarray(x)))
    want = naive_gauss(hmm, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_senone_scores_match_definition(hmm):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, hmm.dim)).astype(np.float32)
    tables = build_gmm_tables(hmm)
    got = np.asarray(senone_scores(tables, jnp.asarray(x)))
    want = naive_senone(hmm, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_senone_topk_close_to_full(hmm):
    """k-best Gaussian pruning (gprune_beam analogue) only drops tail
    mass, so with k = n_mix - 1 scores stay within the dropped mass."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, hmm.dim)).astype(np.float32)
    tables = build_gmm_tables(hmm)
    full = np.asarray(senone_scores(tables, jnp.asarray(x)))
    pruned = np.asarray(senone_scores(tables, jnp.asarray(x), topk=2))
    assert np.all(pruned <= full + 1e-5)
    assert np.max(full - pruned) < 2.0


def test_pseudo_scores_max_over_members(hmm):
    ps = build_pseudo_sets(hmm, ["a", "b"])  # degenerate: resolves directly
    # build sets for names that do not exist as phones
    hmm2 = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("x-a+y", "z-a+w", "b"), n_mix=2))
    ps = build_pseudo_sets(hmm2, ["a"])
    assert ps.n_sets == 1
    tables = build_gmm_tables(hmm2, ps)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, hmm2.dim)).astype(np.float32)
    ext = np.asarray(senone_scores(tables, jnp.asarray(x),
                                   iwcd_scheme="max"))
    S = hmm2.n_states
    base = ext[:, :S]
    for j in range(ps.n_set_states):
        mem = ps.members[ps.member_ofs[j]: ps.member_ofs[j + 1]]
        np.testing.assert_allclose(
            ext[:, S + j], np.max(base[:, mem], axis=1), rtol=1e-5)


def test_dnn_scores_reference_math():
    """Scores must equal log10 softmax minus log10 prior (reference
    calc_dnn.c:852-868 semantics)."""
    rng = np.random.default_rng(5)
    din, dh, dout = 24, 32, 16
    params = DNNParams(
        weights=[rng.standard_normal((din, dh)).astype(np.float32) * 0.3,
                 rng.standard_normal((dh, dh)).astype(np.float32) * 0.3],
        biases=[rng.standard_normal(dh).astype(np.float32) * 0.1,
                rng.standard_normal(dh).astype(np.float32) * 0.1],
        output_w=rng.standard_normal((dh, dout)).astype(np.float32) * 0.3,
        output_b=np.zeros(dout, dtype=np.float32),
        log_prior=np.log10(np.full(dout, 1.0 / dout, dtype=np.float32)),
        context_len=1,
        feature_len=din,
    )
    scorer = build_dnn_scorer(params, compute_dtype="float32")
    x = rng.standard_normal((6, din)).astype(np.float32)
    got = np.asarray(dnn_scores(scorer, jnp.asarray(x)))

    h = x
    for w, b in zip(params.weights, params.biases):
        h = 1.0 / (1.0 + np.exp(-(h @ w + b)))
    o = h @ params.output_w + params.output_b
    lse = logsumexp_np(o.astype(np.float64), axis=-1)
    want = (o - lse[:, None]) / np.log(10.0) - params.log_prior
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # softmax rows sum to 1 in log10 space: logsumexp10(log10 p + prior) = 0
    p10 = got + params.log_prior
    s = np.log10(np.sum(10.0 ** p10, axis=-1))
    np.testing.assert_allclose(s, 0.0, atol=1e-5)


def test_dnn_bf16_close_to_f32():
    rng = np.random.default_rng(6)
    din, dh, dout = 40, 64, 32
    params = DNNParams(
        weights=[rng.standard_normal((din, dh)).astype(np.float32) * 0.2],
        biases=[np.zeros(dh, dtype=np.float32)],
        output_w=rng.standard_normal((dh, dout)).astype(np.float32) * 0.2,
        output_b=np.zeros(dout, dtype=np.float32),
        log_prior=np.zeros(dout, dtype=np.float32),
        context_len=1,
        feature_len=din,
    )
    x = rng.standard_normal((8, din)).astype(np.float32)
    f32 = np.asarray(dnn_scores(build_dnn_scorer(params, "float32"),
                                jnp.asarray(x)))
    bf16 = np.asarray(dnn_scores(build_dnn_scorer(params, "bfloat16"),
                                 jnp.asarray(x)))
    assert np.max(np.abs(f32 - bf16)) < 0.05


def test_iwcd_aggregation_schemes():
    """-iwcd1 max / avg / best N aggregation of pseudo phone sets
    (reference outprob_cd, outprob.c:287-420; default IWCD_NBEST
    init_phmm.c:74) against hand-computed values."""
    import jax.numpy as jnp
    import numpy as np
    from julius_tpu.ops.gmm import aggregate_pseudo
    from julius_tpu.utils.logadd import LOG_ZERO

    # two sets: set0 = senones {0,1,2}, set1 = senones {3,4}
    members = jnp.asarray([0, 1, 2, 3, 4], jnp.int32)
    segids = jnp.asarray([0, 0, 0, 1, 1], jnp.int32)
    sen = np.asarray([[-1.0, -3.0, -2.0, -5.0, LOG_ZERO]], np.float32)
    s = jnp.asarray(sen)

    mx = np.asarray(aggregate_pseudo(members, segids, 2, s, "max"))
    np.testing.assert_allclose(mx[0], [-1.0, -5.0], atol=1e-6)

    av = np.asarray(aggregate_pseudo(members, segids, 2, s, "avg"))
    # avg = mean of finite LOG probs (outprob_cd_avg skips LOG_ZERO)
    np.testing.assert_allclose(av[0], [-2.0, -5.0], atol=1e-6)

    b2 = np.asarray(aggregate_pseudo(members, segids, 2, s, "best", 2))
    # best-2 = mean of the top-2 log probs (outprob_cd_nbest)
    np.testing.assert_allclose(b2[0], [(-1.0 - 2.0) / 2, -5.0], atol=1e-6)

    b1 = np.asarray(aggregate_pseudo(members, segids, 2, s, "best", 1))
    np.testing.assert_allclose(b1[0], mx[0], atol=1e-6)

    # schemes genuinely change scores
    assert not np.allclose(mx, av) and not np.allclose(mx, b2)
