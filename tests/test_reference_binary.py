"""Golden cross-validation against the real reference binary.

SURVEY.md §4 notes the reference has no test suite; its de-facto
acceptance test is a golden decode run.  Here we go further: we build
the actual reference C decoder (julius rev 4.6) from /root/reference,
feed it and our TPU-native engine the *same* synthetic HTK model files
and the *same* HTK feature files, and require transcript agreement.

The reference binary is produced out-of-tree (e.g. in /tmp/julius-build,
see BASELINE.md); these tests skip cleanly when it is absent so the
suite stays self-contained.
"""

import io
import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from julius_tpu.config import SearchConfig
from julius_tpu.engine import Engine
from julius_tpu.io.arpa import parse_arpa
from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line
from julius_tpu.io.htk_hmm import parse_hmmdefs_text
from julius_tpu.io.htk_param import HTKParam, write_htk_param

from fixtures import (make_arpa_text, make_dict_text, make_hmmdefs_text,
                      sample_states_and_frames)

JULIUS_BIN = os.environ.get("JULIUS_BIN", "/tmp/julius-build/julius/julius")

pytestmark = pytest.mark.skipif(
    not os.path.exists(JULIUS_BIN),
    reason="reference julius binary not built (see BASELINE.md)")

# utterances decoded by both engines (seed -> expected word sequence)
# dictionary with output symbol == word name so the reference's printed
# transcript (output strings, silhead/siltail included) is directly
# comparable to our word-name results
DICT_WORDS = [
    ("<s>", "[<s>]", ["sil"]),
    ("</s>", "[</s>]", ["sil"]),
    ("AB", "[AB]", ["a", "b"]),
    ("BA", "[BA]", ["b", "a"]),
    ("ABC", "[ABC]", ["a", "b", "c"]),
    ("CA", "[CA]", ["c", "a"]),
]

UTTS = [
    (0, ["<s>", "AB", "BA", "</s>"]),
    (1, ["<s>", "ABC", "</s>"]),
    (2, ["<s>", "CA", "AB", "</s>"]),
    (3, ["<s>", "BA", "</s>"]),
    (4, ["<s>", "AB", "ABC", "</s>"]),
    (5, ["<s>", "CA", "BA", "ABC", "</s>"]),
]

LM_W, LM_P = 2.0, 0.0


@pytest.fixture(scope="module")
def modeldir(tmp_path_factory):
    """Write the synthetic model + feature files once for both engines."""
    d = tmp_path_factory.mktemp("refparity")
    (d / "hmmdefs").write_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    (d / "words.dict").write_text(make_dict_text(DICT_WORDS))
    (d / "lm.arpa").write_text(make_arpa_text())

    hmm = parse_hmmdefs_text(make_hmmdefs_text(
        phones=("a", "b", "c", "sil"), dim=4, n_states=3, n_mix=2))
    voca = Vocabulary()
    for line in make_dict_text(DICT_WORDS).splitlines():
        parse_dict_line(line, voca)
    name2id = {n: i for i, n in enumerate(voca.names)}

    mfcs = []
    for seed, seq in UTTS:
        rng = np.random.default_rng(seed)
        phone_ids = [hmm.phone_index[p]
                     for w in seq for p in voca.phones[name2id[w]]]
        frames, _ = sample_states_and_frames(hmm, phone_ids, rng)
        p = d / f"utt{seed}.mfc"
        write_htk_param(str(p), HTKParam(
            data=frames.astype(np.float32), samp_period=100000,
            kind="MFCC_E"))
        mfcs.append(str(p))
    (d / "filelist.txt").write_text("\n".join(mfcs) + "\n")

    lm = parse_arpa(io.StringIO(make_arpa_text()))
    return d, hmm, voca, lm, mfcs


def run_reference(d, extra=()):
    """Run the reference binary on the shared filelist, return transcripts
    (one list of words per input, pass-2 result; pass-1 on fallback)."""
    cmd = [JULIUS_BIN,
           "-h", str(d / "hmmdefs"),
           "-v", str(d / "words.dict"),
           "-nlr", str(d / "lm.arpa"),
           "-input", "mfcfile",
           "-filelist", str(d / "filelist.txt"),
           "-lmp", str(LM_W), str(LM_P),
           "-lmp2", str(LM_W), str(LM_P),
           "-b", "0", "-n", "1", "-output", "1",
           *extra]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    results = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("sentence1:"):
            results.append(line.split(":", 1)[1].split())
    return results, out.stdout


def test_transcripts_match_reference(modeldir):
    """Both decoders recover the same transcript from identical inputs."""
    d, hmm, voca, lm, mfcs = modeldir
    ref, _ = run_reference(d)
    assert len(ref) == len(UTTS)

    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=LM_W, lm_penalty=LM_P,
                                     lm_weight2=LM_W, lm_penalty2=LM_P,
                                     trellis_topm=16))
    ours = []
    for p in mfcs:
        from julius_tpu.io.htk_param import read_htk_param
        feats = read_htk_param(p).data
        r = eng.decode_features(jnp.asarray(feats[None]),
                                jnp.asarray([feats.shape[0]]))[0]
        assert r.valid
        ours.append(r.words)

    for i, ((seed, expect), rwords, owords) in enumerate(
            zip(UTTS, ref, ours)):
        assert owords == rwords, (
            f"utt {seed}: ours={owords} reference={rwords}")
        # and both equal the generative truth
        assert owords == expect, f"utt {seed}: {owords} != truth {expect}"


def test_triphone_lvcsr_parity_vs_reference():
    """Tied-triphone LVCSR golden run (VERDICT r4: the golden tests
    covered only a 4-phone toy): 1000 words, HMMList logical->physical
    tying, cross-word pseudo CD sets active in BOTH decoders, identical
    feature files (refparity.scenario_triphone).  Requires transcript-
    level agreement on most utterances and WER parity vs the
    generative truth.  Reference: rdhmmlist.c, cdset.c."""
    import tempfile

    from julius_tpu.tools.refparity import scenario_triphone

    with tempfile.TemporaryDirectory(prefix="tri_parity") as d:
        r = scenario_triphone(JULIUS_BIN, d, n_utts=10, n_words=1000)
    # both decoders must be overwhelmingly right on generative inputs;
    # residual disagreement comes from near-tied segmentations under
    # the two engines' (different) pseudo-set approximations
    assert r["our_wer"] <= r["ref_wer"] + 0.02, r
    assert r["transcript_agreement"] >= 0.7, r
    assert r["n_logical_triphones"] > 3000


def test_pass1_transcripts_match_reference(modeldir):
    """First-pass (approximate) results agree too."""
    d, hmm, voca, lm, mfcs = modeldir
    _, stdout = run_reference(d)
    ref1 = [l.strip().split(":", 1)[1].split()
            for l in stdout.splitlines()
            if l.strip().startswith("pass1_best:")]
    assert len(ref1) == len(UTTS)

    eng = Engine(hmm, voca, lm,
                 search=SearchConfig(lm_weight=LM_W, lm_penalty=LM_P,
                                     enable_pass2=False, trellis_topm=16))
    for (seed, _), rwords, p in zip(UTTS, ref1, mfcs):
        from julius_tpu.io.htk_param import read_htk_param
        feats = read_htk_param(p).data
        r = eng.decode_features(jnp.asarray(feats[None]),
                                jnp.asarray([feats.shape[0]]))[0]
        assert r.valid and r.from_pass == 1
        assert r.words == rwords, (
            f"utt {seed} pass1: ours={r.words} reference={rwords}")
