"""DFA grammar reader (.dfa) and grammar structures.

Reference: libsent/src/dfa/rddfa.c:143 — line format
``state terminalID nextstate statuscode`` (statuscode is hex; bit 0x1 marks
an accept state; state 0 is initial).  Arcs with negative terminal and next
state are status-only lines.  Also builds the category-pair constraint
table used as the pass-1 inter-word constraint (reference
libsent/src/dfa/{cpair.c,mkcpair.c}).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field
from typing import Dict, List, Set, Tuple

import numpy as np

ACCEPT_S = 0x01
INITIAL_S = 0x02


@dataclass
class DFAGrammar:
    """DFA_INFO equivalent (reference libsent/include/sent/dfa.h)."""

    n_states: int = 0
    n_terms: int = 0
    # arcs[s] = list of (category, next_state)
    arcs: List[List[Tuple[int, int]]] = field(default_factory=list)
    accept: List[bool] = field(default_factory=list)
    # category id -> word ids (filled from the paired .dict, mkterminfo.c)
    term_words: List[List[int]] = field(default_factory=list)
    sp_category: int = -1

    def category_pair_matrix(self) -> np.ndarray:
        """cp[i, j] = can category j follow category i
        (reference mkcpair.c extract_cpair).  Also row/col for begin (index
        n_terms) and end (n_terms + 1) of sentence."""
        C = self.n_terms
        cp = np.zeros((C + 1, C + 2), dtype=bool)
        BEGIN = C
        for s in range(self.n_states):
            for (cat, to) in self.arcs[s]:
                # sentence can start with cat if an arc from initial state 0
                if s == 0:
                    cp[BEGIN, cat] = True
                for (cat2, _to2) in self.arcs[to]:
                    cp[cat, cat2] = True
                if self.accept[to]:
                    cp[cat, C + 1] = True
        return cp

    def next_categories(self, state: int) -> List[Tuple[int, int]]:
        return self.arcs[state]


def _open_maybe_gz(path: str):
    with open(path, "rb") as f:
        if f.read(2) == b"\x1f\x8b":
            return gzip.open(path, "rt", encoding="utf-8", errors="replace")
    return open(path, "rt", encoding="utf-8", errors="replace")


def load_dfa(path: str) -> DFAGrammar:
    dfa = DFAGrammar()
    max_state = -1
    max_term = -1
    arcs: Dict[int, List[Tuple[int, int]]] = {}
    accept: Set[int] = set()
    with _open_maybe_gz(path) as f:
        for line in f:
            s = line.strip()
            if not s:
                continue
            if s == "DFAEND":
                break
            parts = s.split()
            if len(parts) < 4:
                raise ValueError(f"bad dfa line: {line!r}")
            state = int(parts[0])
            term = int(parts[1])
            nxt = int(parts[2])
            status = int(parts[3], 16)
            max_state = max(max_state, state, nxt)
            if status & ACCEPT_S:
                accept.add(state)
            if term > 0 or nxt > 0:
                arcs.setdefault(state, []).append((term, nxt))
                max_term = max(max_term, term)
    dfa.n_states = max_state + 1
    dfa.n_terms = max_term + 1
    dfa.arcs = [arcs.get(s, []) for s in range(dfa.n_states)]
    dfa.accept = [s in accept for s in range(dfa.n_states)]
    dfa.term_words = [[] for _ in range(dfa.n_terms)]
    return dfa


def attach_terminfo(dfa: DFAGrammar, categories: List[int]) -> None:
    """Fill category -> word-id lists from per-word category assignments
    (the .dict for a grammar uses the category id as the word name column;
    reference mkterminfo.c make_terminfo)."""
    dfa.term_words = [[] for _ in range(dfa.n_terms)]
    for wid, cat in enumerate(categories):
        if 0 <= cat < dfa.n_terms:
            dfa.term_words[cat].append(wid)
