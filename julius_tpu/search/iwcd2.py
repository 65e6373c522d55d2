"""Strict inter-word context dependency for the pass-2 re-scan (v2).

The reference's "standard" build scans pass-2 words with the word-head
triphone resolved against the hypothesis's adjacent word
(`search_bestfirst_v2.c:492` do_viterbi / `:817` do_viterbi_next_word /
`:911` scan_word, compile flag PASS2_STRICT_IWCD), where the "fast"
build (v1) keeps the left-context-free pseudo set for word heads.

TPU formulation: the chain scan reads outprob rows through per-node
`sidx` tables (scan.DeviceChainTables).  Strict IWCD only changes the
rows of the FIRST phone's states, and only as a function of the
left-context CLASS (the preceding word's final base phone).  So v2 is
one extra device table

    head_sidx[V + 1, C, H] int32

(C = distinct word-final base phones + 1; class 0 = no context, keeping
the v1 pseudo rows) gathered per chain by (word, left-context class)
and substituted over the head states before the scan — the rest of the
scan is identical.  Resolution policy matches the reference fallback
chain (outprob_style.c lcdset handling): an exact physical triphone
`lc-p+r` wins; anything unresolvable keeps the v1 approximation.

Runtime-selectable via SearchConfig.strict_iwcd2 (the reference makes
this a ./configure variant; here both passes coexist, SURVEY.md §5.6).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from julius_tpu.io.htk_dict import Vocabulary
from julius_tpu.models.hmm import HMMSet, center_name, compose_triphone
from julius_tpu.search.network import DecodeNetwork, word_phone_names


class StrictIWCDTables:
    """head_sidx[V+1, C, H] + per-word head length and per-word
    left-context class, device-resident."""

    def __init__(self, net: DecodeNetwork, hmm: HMMSet, voca: Vocabulary,
                 use_triphone: Optional[bool] = None):
        if use_triphone is None:
            use_triphone = hmm.names_are_triphone
        V = net.n_words
        ofs = net.word_node_ofs
        # left-context classes = distinct final base phones over the
        # vocabulary; class 0 = "no context" (sentence start / fallback)
        finals = sorted({center_name(voca.phones[w][-1])
                         for w in range(V) if voca.phones[w]})
        self.class_of_phone = {p: i + 1 for i, p in enumerate(finals)}
        C = len(finals) + 1
        lc_of_word = np.zeros(V + 1, np.int32)
        for w in range(V):
            if voca.phones[w]:
                lc_of_word[w] = self.class_of_phone[
                    center_name(voca.phones[w][-1])]
        self.lc_of_word = lc_of_word
        # head-phone spans and default rows
        H = 0
        head_ns = np.zeros(V + 1, np.int32)
        for w in range(V):
            names = word_phone_names(voca.phones[w], use_triphone)
            if not names:
                continue
            # first phone's nodes are the first ns nodes of the chain
            # (network.py appends phone states in order)
            kind_pid = _resolve(hmm, names[0])
            ns = (int(hmm.phone_ns[kind_pid]) if kind_pid is not None
                  else 0)
            ns = min(ns, int(ofs[w + 1] - ofs[w]))
            head_ns[w] = ns
            H = max(H, ns)
        self.H = H
        head_sidx = np.zeros((V + 1, C, max(H, 1)), np.int32)
        n_resolved = 0
        for w in range(V):
            ns = int(head_ns[w])
            if ns == 0:
                continue
            n0 = int(ofs[w])
            default = net.score_idx[n0:n0 + ns]
            head_sidx[w, :, :ns] = default[None, :]
            phones = voca.phones[w]
            base = center_name(phones[0])
            right = center_name(phones[1]) if len(phones) > 1 else None
            if not use_triphone:
                continue
            for cname, ci in self.class_of_phone.items():
                tri = compose_triphone(cname, base, right)
                pid = hmm.logical_map.get(tri, hmm.phone_index.get(tri))
                if pid is None or int(hmm.phone_ns[pid]) != ns:
                    continue       # keep the v1 pseudo approximation
                head_sidx[w, ci, :ns] = hmm.phone_states[pid, :ns]
                n_resolved += 1
        self.n_resolved = n_resolved
        self.head_sidx_np = head_sidx
        self.head_ns_np = head_ns
        self.head_sidx = jnp.asarray(head_sidx)
        self.head_ns = jnp.asarray(head_ns)


def build_rc_tables(net: DecodeNetwork, hmm: HMMSet, voca: Vocabulary,
                    use_triphone: Optional[bool] = None):
    """Node-level view of the strict head-context tables for PASS 1
    (reference outprob_style.c:354 per-last-word RC assignment with the
    per-node cache, wchmm.h:55-83): returns

        rc_head [N]      row into rc_sidx for word-head states (-1 =
                         emission row fixed at net.score_idx)
        rc_sidx [NH, C]  override outprob rows per left-context class
                         (class 0 = no context = the v1 pseudo row)
        lc_class [V]     word id -> left-context class of its final
                         base phone

    consumed by pass1.build_device_network(rc_tables=...)."""
    tabs = StrictIWCDTables(net, hmm, voca, use_triphone=use_triphone)
    N = net.n_nodes
    V = net.n_words
    ofs = net.word_node_ofs
    rc_head = np.full(N, -1, np.int32)
    rows = []
    for w in range(V):
        ns = int(tabs.head_ns_np[w])
        for j in range(ns):
            rc_head[int(ofs[w]) + j] = len(rows)
            rows.append(tabs.head_sidx_np[w, :, j])
    C = tabs.head_sidx_np.shape[1]
    rc_sidx = (np.stack(rows) if rows
               else np.zeros((0, C), np.int32))
    return rc_head, rc_sidx, tabs.lc_of_word[:V].astype(np.int32)


def _resolve(hmm: HMMSet, name: str) -> Optional[int]:
    pid = hmm.logical_map.get(name)
    if pid is None:
        pid = hmm.phone_index.get(name)
    if pid is None:
        pid = hmm.logical_map.get(center_name(name),
                                  hmm.phone_index.get(center_name(name)))
    return pid
