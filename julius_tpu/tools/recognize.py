"""Batch/streaming recognizer CLI — the `julius` application equivalent.

Reference: `julius/main.c` + `recogloop.c` + `output_stdout.c`.  Usage:

    python -m julius_tpu.tools.recognize -C file.jconf audio1.wav ...
    python -m julius_tpu.tools.recognize -h am.binhmm -v dict \\
        -d lm.bingram -filelist list.txt
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from julius_tpu.engine import Result
from julius_tpu.fusion import create_engines
from julius_tpu.io.wav import read_audio
from julius_tpu.jconf import parse_jconf
from julius_tpu.utils.jlog import LogLevel, jlog


def format_result(r: Result, sr_name: str = "_default",
                  separate_score: bool = False) -> str:
    """Reference output_stdout.c result block format."""
    lines = []
    if not r.valid:
        lines.append("<input rejected by decoder>")
        return "\n".join(lines)
    nbest = r.nbest or [r]
    for i, h in enumerate(nbest, 1):
        text = " ".join(t for t in (h.texts or h.words) if t)
        lines.append(f"sentence{i}: {text}")
        lines.append(f"wseq{i}: {' '.join(h.words)}")
        if h.cm is not None:
            lines.append(
                f"cmscore{i}: " + " ".join(f"{c:.3f}" for c in h.cm))
        if separate_score:
            lines.append(f"score{i}: {h.score:.6f} "
                         f"(AM: {h.am_score:.6f} LM: {h.lm_score:.6f})")
        else:
            lines.append(f"score{i}: {h.score:.6f}")
    return "\n".join(lines)


def collect_inputs(cfg, extra: List[str]) -> List[str]:
    files = [a for a in extra if not a.startswith("-")]
    if cfg.filelist_path:
        with open(cfg.filelist_path) as f:
            files.extend(s.strip() for s in f if s.strip())
    return files


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    opts = []
    files = []
    i = 0
    # split positional audio files from options (options consume values)
    known_novalue = {"-1pass", "-walign", "-palign", "-salign", "-lattice",
                     "-nolattice", "-confnet", "-noconfnet", "-mbr",
                     "-nombr", "-cvn", "-cmnstatic", "-cmnnoupdate",
                     "-enormal", "-noenormal", "-rawe", "-norawe",
                     "-zmeanframe", "-nozmeanframe", "-usepower", "-iwsp",
                     "-cutsilence", "-nocutsilence", "-quiet", "-debug",
                     "-outfile", "-module", "-force_ccd", "-no_ccd"}
    while i < len(argv):
        a = argv[i]
        if a.startswith("-"):
            opts.append(a)
            if a == "-SR":
                opts.extend(argv[i + 1: i + 4])
                i += 3
            elif a == "-lmp" or a == "-lmp2" or a == "-vtln":
                k = 3 if a == "-vtln" else 2
                opts.extend(argv[i + 1: i + 1 + k])
                i += k
            elif a not in known_novalue and i + 1 < len(argv):
                opts.append(argv[i + 1])
                i += 1
        else:
            files.append(a)
        i += 1

    cfg = parse_jconf(opts)
    engines = create_engines(cfg)
    files = collect_inputs(cfg, files)
    if not files:
        jlog(LogLevel.ERROR, "no input files (give paths or -filelist)")
        return 1
    outprob_out = getattr(cfg, "outprob_out", None)

    B = max(1, cfg.batch_size)
    mfc_mode = cfg.input_source in ("mfcfile", "htkparam")
    for ofs in range(0, len(files), B):
        chunk = files[ofs: ofs + B]
        if mfc_mode:
            # feature-file input (reference -input mfcfile, m_adin.c)
            from julius_tpu.io.htk_param import read_htk_param
            params = [read_htk_param(p) for p in chunk]
            T = max(p.data.shape[0] for p in params)
            batch = np.zeros((len(params), T, params[0].data.shape[1]),
                             dtype=np.float32)
            lens = np.zeros(len(params), dtype=np.int32)
            for j, p in enumerate(params):
                batch[j, : p.data.shape[0]] = p.data
                lens[j] = p.data.shape[0]
        else:
            waves = [read_audio(p) for p in chunk]
            L = max(len(w) for w in waves)
            batch = np.zeros((len(waves), L), dtype=np.float32)
            lens = np.zeros(len(waves), dtype=np.int32)
            for j, w in enumerate(waves):
                batch[j, : len(w)] = w
                lens[j] = len(w)
        for eng in engines:
            if mfc_mode:
                results = eng.decode_features(batch, lens)
            else:
                results = eng.recognize_batch(batch, lens)
            if outprob_out:
                # -outprobout: dump state scores as HTK USER params
                # (reference recogmain.c:1225-1242)
                import jax
                from julius_tpu.io.htk_param import (HTKParam,
                                                     write_htk_param)
                feats = batch if mfc_mode else np.asarray(
                    jax.jit(eng._features)(batch, lens)[0])
                rows = eng.compute_outprob(feats)
                for j, path in enumerate(chunk):
                    out = f"{outprob_out}.{ofs + j:04d}.prob"
                    write_htk_param(out, HTKParam(
                        data=rows[j, : lens[j]].astype(np.float32),
                        samp_period=100000, kind="USER"))
                    print(f"outprob written: {out}")
            for path, r in zip(chunk, results):
                print(f"\ninput: {path}")
                print(format_result(r))
                if r.alignment is not None:
                    al = r.alignment
                    if eng.search_cfg.align_word:
                        print("=== word alignment ===")
                        for w in al.words:
                            print(f"[{w['begin']:4d} {w['end']:4d}] "
                                  f"{w['word']}")
                    if eng.search_cfg.align_phoneme:
                        print("=== phoneme alignment ===")
                        for p in al.phones:
                            print(f"[{p['begin']:4d} {p['end']:4d}] "
                                  f"{p['phone']}")
                    if eng.search_cfg.align_state:
                        print("=== state alignment ===")
                        for s in al.states:
                            print(f"[{s['begin']:4d} {s['end']:4d}] "
                                  f"{s['phone']}.s{s['state']}")
                if eng.search_cfg.graph_out and r.graph is not None:
                    from julius_tpu.search.graphout import graph_to_text
                    print("--- begin wordgraph data ---")
                    print(graph_to_text(r.graph, eng.voca.names), end="")
                    print("--- end wordgraph data ---")
                if eng.search_cfg.confnet_out and r.confnet is not None:
                    print("--- begin confusion network ---")
                    for c in r.confnet:
                        alts = " ".join(
                            f"({eng.voca.names[w]}:{p:.3f})"
                            for w, p in zip(c.words, c.probs))
                        print(alts)
                    print("--- end confusion network ---")
    return 0


if __name__ == "__main__":
    sys.exit(main())
