"""Module-mode server: the TCP control/result protocol.

Reference: `julius/module.c` (commands, default port 10500) and
`julius/output_module.c` (XML-ish result messages).  Wire format:
newline-terminated command strings in; out-messages are XML fragments
terminated by a line containing a single '.' (module_send "...\\n.\\n").

Commands covered: STATUS, VERSION, DIE, PAUSE, TERMINATE, RESUME,
INPUTONCHANGE, GRAMINFO, CHANGEGRAM, ADDGRAM, DELGRAM, ACTIVATEGRAM,
DEACTIVATEGRAM, SYNCGRAM, LISTPROCESS, CURRENTPROCESS.  Grammar
payloads arrive like the reference's: dfa+dict body over the socket
after the command line.
"""

from __future__ import annotations

import io
import socket
import threading
from typing import Dict, List, Optional

import numpy as np

from julius_tpu.engine import Result
from julius_tpu.utils.jlog import LogLevel, jlog

MODULE_PORT = 10500
VERSION_STR = "julius_tpu"


def result_to_xml(r: Result, voca=None) -> str:
    """<RECOGOUT> block (reference output_module.c result_pass2)."""
    if not r.valid:
        return '<RECOGFAIL/>\n'
    out = ['<RECOGOUT>']
    nbest = r.nbest or [r]
    for rank, h in enumerate(nbest, 1):
        out.append(f'  <SHYPO RANK="{rank}" SCORE="{h.score:.6f}">')
        cms = h.cm if h.cm is not None else [None] * len(h.words)
        for w, t, cm in zip(h.words, h.texts or h.words, cms):
            attrs = f'WORD="{t}" CLASSID="{w}"'
            if cm is not None:
                attrs += f' CM="{cm:.3f}"'
            out.append(f'    <WHYPO {attrs}/>')
        out.append('  </SHYPO>')
    out.append('</RECOGOUT>\n')
    return "\n".join(out)


class ModuleServer:
    """One-client control server driving a recognition engine."""

    def __init__(self, engines: List, port: int = MODULE_PORT,
                 host: str = "127.0.0.1"):
        self.engines = engines
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._client: Optional[socket.socket] = None
        self._rfile = None
        self.active = True
        self.terminated = False
        self.alive = True
        self.grammars: Dict[int, str] = {}   # gid -> prefix/name
        self._next_gid = 0

    # -- plumbing ---------------------------------------------------------

    def accept(self):
        self._client, _ = self._srv.accept()
        self._rfile = self._client.makefile("rb")

    def send(self, msg: str):
        if self._client is not None:
            self._client.sendall(msg.encode("utf-8") + b".\n")

    def send_result(self, r: Result):
        self.send(result_to_xml(r))

    def _readline(self) -> Optional[str]:
        line = self._rfile.readline()
        if not line:
            return None
        return line.decode("utf-8", errors="replace").strip()

    # -- command loop -----------------------------------------------------

    def serve_forever(self):
        """Blocking command loop (reference msock_check_and_process)."""
        while self.alive:
            cmd = self._readline()
            if cmd is None:
                break
            if cmd:
                self.execute(cmd)

    def execute(self, cmd: str):
        """One command (reference msock_exec_command, module.c:198)."""
        if cmd == "STATUS":
            st = "ACTIVE" if self.active else "SLEEP"
            self.send(f'<SYSINFO PROCESS="{st}"/>\n')
        elif cmd == "VERSION":
            self.send(f'<ENGINEINFO TYPE="{VERSION_STR}" VERSION="r1" '
                      'CONF="tpu"/>\n')
        elif cmd == "DIE":
            self.alive = False
            if self._client:
                self._client.close()
                self._client = None
        elif cmd == "PAUSE" or cmd == "TERMINATE":
            self.active = False
            self.terminated = cmd == "TERMINATE"
            self.send('<SYSINFO PROCESS="SLEEP"/>\n')
        elif cmd == "RESUME":
            self.active = True
            self.terminated = False
            self.send('<SYSINFO PROCESS="ACTIVE"/>\n')
        elif cmd == "INPUTONCHANGE":
            self._readline()   # TERMINATE|PAUSE|WAIT argument
        elif cmd == "GRAMINFO":
            lines = ["<GRAMINFO>"]
            for gid, name in self.grammars.items():
                lines.append(f'  #{gid}: "{name}"')
            lines.append("</GRAMINFO>\n")
            self.send("\n".join(lines))
        elif cmd.startswith(("CHANGEGRAM", "ADDGRAM")):
            name = cmd.split(None, 1)[1] if " " in cmd else "grammar"
            dfa_text, dict_text = self._read_grammar_body()
            gid = self._next_gid
            self._next_gid += 1
            if cmd.startswith("CHANGEGRAM"):
                self.grammars = {gid: name}
            else:
                self.grammars[gid] = name
            try:
                self._rebuild_grammar(gid, name, dfa_text, dict_text,
                                      replace=cmd.startswith("CHANGEGRAM"))
                self.send(f'<GRAMMAR STATUS="RECEIVED" ID="{gid}"/>\n')
            except Exception as e:
                self.send(f'<GRAMMAR STATUS="ERROR" REASON="{e}"/>\n')
        elif cmd.startswith("DELGRAM"):
            for g in cmd.split()[1:]:
                self.grammars.pop(int(g), None)
            self.send('<GRAMMAR STATUS="READY"/>\n')
        elif cmd.startswith(("ACTIVATEGRAM", "DEACTIVATEGRAM", "SYNCGRAM")):
            self.send('<GRAMMAR STATUS="READY"/>\n')
        elif cmd == "LISTPROCESS":
            lines = ["<PROCESSLIST>"]
            for i, e in enumerate(self.engines):
                lines.append(
                    f'  <PROCESS ID="{i}" NAME="{e.search_cfg.name}" '
                    f'LMTYPE="{e.lmtype}"/>')
            lines.append("</PROCESSLIST>\n")
            self.send("\n".join(lines))
        elif cmd == "CURRENTPROCESS":
            self.send('<PROCESS ID="0"/>\n')
        else:
            jlog(LogLevel.WARNING, f"module: unknown command {cmd!r}")

    # -- grammar updates --------------------------------------------------

    def _read_grammar_body(self):
        """Grammar body: dfa lines until 'DFAEND', dict lines until
        'DICEND' (reference read from the same socket)."""
        dfa_lines, dict_lines = [], []
        while True:
            line = self._readline()
            if line is None:
                raise IOError("connection closed mid-grammar")
            dfa_lines.append(line)
            if line.strip() == "DFAEND":
                break
        while True:
            line = self._readline()
            if line is None:
                raise IOError("connection closed mid-grammar")
            dict_lines.append(line)
            if line.strip() == "DICEND":
                break
        return "\n".join(dfa_lines), "\n".join(dict_lines)

    def _rebuild_grammar(self, gid: int, name: str, dfa_text: str,
                         dict_text: str, replace: bool):
        """Swap the grammar of grammar-mode engines (reference
        multigram_update -> rebuild wchmm; we rebuild the flat decode
        network, which is fast)."""
        from julius_tpu.engine import Engine
        from julius_tpu.io.dfa import parse_dfa
        from julius_tpu.io.htk_dict import Vocabulary, parse_dict_line

        dfa = parse_dfa(io.StringIO(dfa_text))
        voca = Vocabulary()
        for line in dict_text.splitlines():
            parse_dict_line(line, voca)
        word_cat = np.asarray([int(n) for n in voca.names], dtype=np.int32)
        for i, e in enumerate(self.engines):
            if e.lmtype == "grammar":
                self.engines[i] = Engine(
                    e.hmm, voca, dfa=dfa, word_cat=word_cat,
                    frontend=e.fe_cfg, search=e.search_cfg,
                    am_cfg=e.am_cfg)
