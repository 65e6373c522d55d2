"""Synthetic model fixtures.

The reference has no test suite (SURVEY.md §4); ours builds tiny synthetic
HTK-format models, dictionaries and LMs from numpy, writes them in the real
file formats, and round-trips them through the parsers.  Decode tests
generate audio from the generative model itself so the expected transcript
is known by construction.
"""

from __future__ import annotations

import io
import math

import numpy as np

RNG = np.random.default_rng


def make_hmmdefs_text(
    phones=("a", "b", "c", "sil"),
    dim=4,
    n_states=3,
    n_mix=2,
    seed=0,
) -> str:
    """Generate a tiny ascii hmmdefs with diag-Gaussian mixtures.

    Means are well-separated per phone so synthetic decoding is easy."""
    rng = RNG(seed)
    out = io.StringIO()
    out.write(f"~o <VecSize> {dim} <MFCC_E> <DIAGC> <NULLD>\n")
    for pi, p in enumerate(phones):
        out.write(f'~h "{p}"\n<BeginHMM>\n<NumStates> {n_states + 2}\n')
        for s in range(n_states):
            out.write(f"<State> {s + 2}\n")
            if n_mix > 1:
                out.write(f"<NumMixes> {n_mix}\n")
            base = np.zeros(dim)
            base[pi % dim] = 3.0 * (1 + pi // dim)
            base[(pi + 1) % dim] = -1.5 * s
            for m in range(n_mix):
                if n_mix > 1:
                    out.write(f"<Mixture> {m + 1} {1.0 / n_mix:.6f}\n")
                mean = base + 0.3 * rng.standard_normal(dim)
                var = 0.5 + 0.2 * rng.random(dim)
                out.write(f"<Mean> {dim}\n")
                out.write(" " + " ".join(f"{x:.6f}" for x in mean) + "\n")
                out.write(f"<Variance> {dim}\n")
                out.write(" " + " ".join(f"{x:.6f}" for x in var) + "\n")
        # strict left-to-right transitions
        N = n_states + 2
        trans = np.zeros((N, N))
        trans[0, 1] = 1.0
        for s in range(1, N - 1):
            trans[s, s] = 0.6
            trans[s, s + 1] = 0.4
        out.write(f"<TransP> {N}\n")
        for r in range(N):
            out.write(" " + " ".join(f"{x:.6f}" for x in trans[r]) + "\n")
        out.write("<EndHMM>\n")
    return out.getvalue()


def make_dict_text(words=None) -> str:
    if words is None:
        words = [
            ("<s>", "[]", ["sil"]),
            ("</s>", "[]", ["sil"]),
            ("AB", "[ab]", ["a", "b"]),
            ("BA", "[ba]", ["b", "a"]),
            ("ABC", "[abc]", ["a", "b", "c"]),
            ("CA", "[ca]", ["c", "a"]),
        ]
    lines = []
    for name, out, phones in words:
        lines.append(f"{name}\t{out}\t" + " ".join(phones))
    return "\n".join(lines) + "\n"


def make_arpa_text(seed=0) -> str:
    """Tiny 2-gram over the fixture dictionary words."""
    words = ["<s>", "</s>", "AB", "BA", "ABC", "CA"]
    rng = RNG(seed)
    uni = {}
    for w in words:
        uni[w] = -0.8 - 0.8 * rng.random()
    bi = {}
    for v in words:
        if v == "</s>":
            continue
        for w in words:
            if w == "<s>":
                continue
            if rng.random() < 0.8:
                bi[(v, w)] = -0.3 - 1.0 * rng.random()
    out = io.StringIO()
    out.write("\n\\data\\\n")
    out.write(f"ngram 1={len(uni)}\n")
    out.write(f"ngram 2={len(bi)}\n")
    out.write("\n\\1-grams:\n")
    for w, p in uni.items():
        out.write(f"{p:.4f}\t{w}\t-0.30\n")
    out.write("\n\\2-grams:\n")
    for (v, w), p in bi.items():
        out.write(f"{p:.4f}\t{v} {w}\n")
    out.write("\n\\end\\\n")
    return out.getvalue()


def make_dfa_text() -> str:
    """Grammar: category 0 then category 1, accept.

    Julius .dfa convention: state 0 initial; status 1 = accept."""
    return (
        "0 0 1 0\n"
        "1 1 2 0\n"
        "2 -1 -1 1\n"
        "DFAEND\n"
    )


def sample_states_and_frames(hmm, phone_ids, rng, max_frames=2000):
    """Sample a state path and observation frames from the generative model.

    hmm: HMMSet; phone_ids: physical phone id sequence."""
    frames = []
    states = []
    for pid in phone_ids:
        ns = int(hmm.phone_ns[pid])
        trans = hmm.phone_trans[pid]
        # enter at first emitting state (strict L2R fixtures)
        s = 0
        while s < ns:
            senone = int(hmm.phone_states[pid, s])
            # emit from the senone's mixture
            mixes = hmm.state_mix[senone]
            lws = hmm.state_lw[senone]
            valid = mixes >= 0
            w = np.exp(lws[valid])
            w = w / w.sum()
            k = rng.choice(np.flatnonzero(valid), p=w)
            g = int(mixes[k])
            mean = hmm.means[g]
            var = 1.0 / hmm.ivars[g]
            frames.append(mean + np.sqrt(var) * rng.standard_normal(len(mean)))
            states.append(senone)
            # transition
            p_self = math.exp(trans[s + 1, s + 1])
            if rng.random() > p_self:
                s += 1
            if len(frames) >= max_frames:
                return np.asarray(frames, np.float32), states
    return np.asarray(frames, np.float32), states
