"""Extract data-driven test cases from the reference's Lua DDT bundles.

The reference's test corpus (`test/ddt_suite/*.lua`, test/README.md:100-135)
is a sequence of ``t { key = value, ... }`` calls with JSON-string payloads.
This module parses the *declarative subset* — string literals (quoted and
``[[long bracket]]``), numbers, booleans, identifier references to
``local name = <string>`` bindings, and flat table literals — WITHOUT
executing any Lua. Cases using runtime Lua (loops, concatenation, indexing)
are skipped and counted, so the harness knows its own coverage.

This is a test-corpus *extractor*, not a port of reference code: it reads
the public test data shipped in the reference repo and replays the same
schema/input/output triples through our engine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class DdtCase:
    file: str
    line: int
    fields: dict[str, Any] = field(default_factory=dict)


@dataclass
class ExtractResult:
    cases: list[DdtCase]
    skipped: int  # t-blocks containing non-declarative Lua


class _Scanner:
    def __init__(self, src: str):
        self.src = src
        self.i = 0
        self.n = len(src)

    def eof(self) -> bool:
        return self.i >= self.n

    def peek(self) -> str:
        return self.src[self.i] if self.i < self.n else ""

    def skip_ws_and_comments(self) -> None:
        while not self.eof():
            c = self.src[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif self.src.startswith("--[[", self.i):
                end = self.src.find("]]", self.i + 4)
                self.i = self.n if end < 0 else end + 2
            elif self.src.startswith("--", self.i):
                nl = self.src.find("\n", self.i)
                self.i = self.n if nl < 0 else nl + 1
            else:
                return

    def read_long_string(self) -> Optional[str]:
        m = re.match(r"\[(=*)\[", self.src[self.i:])
        if not m:
            return None
        eq = m.group(1)
        start = self.i + len(m.group(0))
        close = f"]{eq}]"
        end = self.src.find(close, start)
        if end < 0:
            raise ValueError("unterminated long string")
        self.i = end + len(close)
        return self.src[start:end]

    def read_quoted(self) -> Optional[str]:
        q = self.peek()
        if q not in "'\"":
            return None
        i = self.i + 1
        out = []
        while i < self.n:
            c = self.src[i]
            if c == "\\":
                nxt = self.src[i + 1]
                out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                i += 2
            elif c == q:
                self.i = i + 1
                return "".join(out)
            else:
                out.append(c)
                i += 1
        raise ValueError("unterminated string")

    def read_ident(self) -> Optional[str]:
        m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", self.src[self.i:])
        if not m:
            return None
        self.i += len(m.group(0))
        return m.group(0)

    def read_number(self) -> Optional[float]:
        m = re.match(r"-?\d+(\.\d+)?([eE][+-]?\d+)?", self.src[self.i:])
        if not m:
            return None
        self.i += len(m.group(0))
        txt = m.group(0)
        return float(txt) if ("." in txt or "e" in txt or "E" in txt) else int(txt)


class _Unparseable(Exception):
    pass


def _read_value(sc: _Scanner, env: dict[str, Any]) -> Any:
    sc.skip_ws_and_comments()
    v = sc.read_long_string()
    if v is not None:
        return v
    v = sc.read_quoted()
    if v is not None:
        return v
    if sc.peek() == "{":
        sc.i += 1
        items: list[Any] = []
        while True:
            sc.skip_ws_and_comments()
            if sc.peek() == "}":
                sc.i += 1
                return items
            items.append(_read_value(sc, env))
            sc.skip_ws_and_comments()
            if sc.peek() == ",":
                sc.i += 1
            elif sc.peek() == "}":
                continue
            else:
                raise _Unparseable("table sep")
    num = sc.read_number()
    if num is not None:
        return num
    ident = sc.read_ident()
    if ident is not None:
        if ident == "true":
            return True
        if ident == "false":
            return False
        if ident == "nil":
            return None
        sc.skip_ws_and_comments()
        # identifier must be a plain reference; indexing/concat = runtime Lua
        if sc.peek() in "[.(":
            raise _Unparseable(f"indexing on {ident}")
        if sc.src.startswith("..", sc.i):
            raise _Unparseable("concat")
        if ident in env:
            return env[ident]
        raise _Unparseable(f"unbound identifier {ident}")
    raise _Unparseable(f"value at ...{sc.src[sc.i:sc.i+30]!r}")


def _read_t_block(sc: _Scanner, env: dict[str, Any]) -> dict[str, Any]:
    """Parse `{ key = value, ... }` after the `t` identifier."""
    sc.skip_ws_and_comments()
    if sc.peek() != "{":
        raise _Unparseable("t without table")
    sc.i += 1
    fields: dict[str, Any] = {}
    while True:
        sc.skip_ws_and_comments()
        if sc.peek() == "}":
            sc.i += 1
            return fields
        key = sc.read_ident()
        if key is None:
            raise _Unparseable("key expected")
        sc.skip_ws_and_comments()
        if sc.peek() != "=" or sc.src.startswith("==", sc.i):
            raise _Unparseable("= expected")
        sc.i += 1
        fields[key] = _read_value(sc, env)
        sc.skip_ws_and_comments()
        if sc.peek() in ",;":
            sc.i += 1


def extract_file(path: str) -> ExtractResult:
    src = open(path).read()
    sc = _Scanner(src)
    env: dict[str, Any] = {}
    cases: list[DdtCase] = []
    skipped = 0
    while True:
        sc.skip_ws_and_comments()
        if sc.eof():
            break
        start = sc.i
        line = src.count("\n", 0, start) + 1
        ident = sc.read_ident()
        if ident == "local":
            sc.skip_ws_and_comments()
            name = sc.read_ident()
            sc.skip_ws_and_comments()
            if name and sc.peek() == "=" and not sc.src.startswith("==", sc.i):
                sc.i += 1
                try:
                    env[name] = _read_value(sc, env)
                except _Unparseable:
                    _skip_statement(sc)
            else:
                _skip_statement(sc)
        elif ident == "t":
            try:
                fields = _read_t_block(sc, env)
                cases.append(DdtCase(file=path, line=line, fields=fields))
            except _Unparseable:
                skipped += 1
                sc.i = start + 1
                _skip_balanced_block(sc)
        elif ident is None:
            sc.i += 1  # stray punctuation
        else:
            _skip_statement(sc)
    return ExtractResult(cases=cases, skipped=skipped)


def _skip_statement(sc: _Scanner) -> None:
    """Advance past the rest of a line-ish statement, respecting strings."""
    while not sc.eof():
        c = sc.peek()
        if c == "\n":
            sc.i += 1
            return
        if c in "'\"":
            sc.read_quoted()
        elif sc.src.startswith("[[", sc.i) or re.match(r"\[=+\[", sc.src[sc.i:]):
            sc.read_long_string()
        else:
            sc.i += 1


def _skip_balanced_block(sc: _Scanner) -> None:
    """After a failed t{...} parse: skip to the matching close brace."""
    sc.skip_ws_and_comments()
    if sc.peek() != "{":
        _skip_statement(sc)
        return
    depth = 0
    while not sc.eof():
        c = sc.peek()
        if c in "'\"":
            sc.read_quoted()
            continue
        if sc.src.startswith("[[", sc.i) or re.match(r"\[=+\[", sc.src[sc.i:]):
            sc.read_long_string()
            continue
        if sc.src.startswith("--", sc.i):
            sc.skip_ws_and_comments()
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                sc.i += 1
                return
        sc.i += 1
