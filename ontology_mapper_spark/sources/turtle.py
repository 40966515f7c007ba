"""S1 extension — Turtle reader (no rdflib; vendored subset grammar).

The reference parses Turtle through rdflib into an in-memory graph
(/root/reference/core/parser.py:105-133); rdflib is absent in this
environment (SURVEY.md env facts), and block-structured Turtle cannot be
split-scanned anyway, so this is a DRIVER-SIDE parser by design — exactly
like the reference, whose rdflib load is also whole-document in-memory.
Ontology inputs are config-sized by contract; the cluster-scale triple
representation is the parquet `triples` table, and the cluster-writable
RDF surface is N-Triples (sinks/exports.py).

Grammar subset (covers the engine's own Turtle output and the common
shape of real ontology .ttl files):

* ``@prefix`` / ``@base`` and SPARQL-style ``PREFIX`` / ``BASE``;
* IRIs ``<...>`` (with ``\\uXXXX``/``\\UXXXXXXXX`` escapes), prefixed
  names, ``a``;
* literals in all four quote forms (``"``, ``'``, ``\"\"\"``, ``'''``)
  with string escapes, ``@lang`` tags and ``^^datatype``;
* numeric / boolean shorthand literals;
* ``;`` predicate lists, ``,`` object lists;
* blank nodes: ``_:label``, anonymous ``[]``, property lists
  ``[ p o ; ... ]``, and collections ``( ... )`` (expanded to
  rdf:first/rdf:rest chains).

Output schema matches read_ntriples — (subj, pred, obj, obj_type, lang)
— plus ``datatype`` (Turtle carries it; NT reading drops it today).
obj_type ∈ {'uri', 'literal', 'bnode'}.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


class TurtleSyntaxError(ValueError):
    pass


class _Tokenizer:
    """Hand-rolled tokenizer: whitespace/comment skipping plus the token
    shapes the subset grammar needs."""

    def __init__(self, text: str) -> None:
        self.text = text
        self.i = 0
        self.n = len(text)

    def _skip_ws(self) -> None:
        t, n = self.text, self.n
        while self.i < n:
            ch = t[self.i]
            if ch in " \t\r\n":
                self.i += 1
            elif ch == "#":
                j = t.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def peek(self) -> str | None:
        self._skip_ws()
        return self.text[self.i] if self.i < self.n else None

    def _string_body(self, quote: str, long: bool) -> str:
        t = self.text
        out: list[str] = []
        end = quote * 3 if long else quote
        while True:
            if self.i >= self.n:
                raise TurtleSyntaxError("unterminated string")
            if t.startswith(end, self.i):
                self.i += len(end)
                return "".join(out)
            ch = t[self.i]
            if ch == "\\":
                esc = t[self.i + 1] if self.i + 1 < self.n else ""
                if esc in _ESCAPES:
                    out.append(_ESCAPES[esc])
                    self.i += 2
                elif esc == "u":
                    out.append(chr(int(t[self.i + 2 : self.i + 6], 16)))
                    self.i += 6
                elif esc == "U":
                    out.append(chr(int(t[self.i + 2 : self.i + 10], 16)))
                    self.i += 10
                else:
                    raise TurtleSyntaxError(f"bad escape \\{esc}")
            elif not long and ch in ("\n", "\r"):
                raise TurtleSyntaxError("newline in short string")
            else:
                out.append(ch)
                self.i += 1

    _PNAME_RE = re.compile(r"[A-Za-z0-9_\-.:%\\]*")
    # DECIMAL requires digits AFTER the dot ('123.' = integer + terminator)
    _NUM_RE = re.compile(r"[+-]?(\d+\.\d+|\.\d+|\d+)([eE][+-]?\d+)?")

    def next(self):
        """→ (kind, value[, extra]) or None at EOF. Kinds: 'iri', 'pname',
        'bnode', 'string' (value, lang, dtype handled by parser), 'num',
        'punct' (./;/,/[/]/(/)), 'kw' (@prefix/@base/a/true/false/PREFIX/
        BASE), 'langtag', 'hathat'."""
        self._skip_ws()
        if self.i >= self.n:
            return None
        t = self.text
        ch = t[self.i]
        if ch == "<":
            j = t.find(">", self.i + 1)
            if j < 0:
                raise TurtleSyntaxError("unterminated IRI")
            raw = t[self.i + 1 : j]
            self.i = j + 1
            raw = re.sub(r"\\u([0-9A-Fa-f]{4})", lambda m: chr(int(m.group(1), 16)), raw)
            raw = re.sub(r"\\U([0-9A-Fa-f]{8})", lambda m: chr(int(m.group(1), 16)), raw)
            return ("iri", raw)
        if ch in ".;,[](){}":
            self.i += 1
            return ("punct", ch)
        if ch in "\"'":
            long = t.startswith(ch * 3, self.i)
            self.i += 3 if long else 1
            return ("string", self._string_body(ch, long))
        if ch == "@":
            m = re.match(r"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)", t[self.i :])
            word = m.group(1)
            self.i += m.end()
            if word in ("prefix", "base"):
                return ("kw", "@" + word)
            return ("langtag", word)
        if t.startswith("^^", self.i):
            self.i += 2
            return ("hathat", "^^")
        if ch == "_" and t.startswith("_:", self.i):
            m = self._PNAME_RE.match(t, self.i + 2)
            label = t[self.i + 2 : m.end()]
            self.i = m.end()
            return ("bnode", "_:" + label)
        m = self._NUM_RE.match(t, self.i)
        if m and (ch.isdigit() or ch in "+-." and m.end() > self.i + (ch in "+-")):
            self.i = m.end()
            return ("num", m.group(0))
        # pname / bare keyword (a, true, false, PREFIX, BASE)
        m = re.match(r"[A-Za-z][A-Za-z0-9_\-]*", t[self.i :])
        start = self.i
        if m and ":" not in t[self.i : self.i + m.end()] and t[self.i + m.end() : self.i + m.end() + 1] != ":":
            word = m.group(0)
            if word in ("a", "true", "false") or word.upper() in (
                "PREFIX", "BASE", "GRAPH",
            ):
                self.i += m.end()
                return ("kw", word)
        pm = self._PNAME_RE.match(t, self.i)
        if pm and pm.end() > start:
            val = t[start : pm.end()]
            # a pname must contain ':' (prefix:local or :local)
            if ":" in val:
                self.i = pm.end()
                # trailing '.' belongs to the statement terminator
                while val.endswith("."):
                    val = val[:-1]
                    self.i -= 1
                return ("pname", val)
        raise TurtleSyntaxError(f"unexpected char {ch!r} at offset {self.i}")


class _Parser:
    def __init__(self, text: str) -> None:
        self.tz = _Tokenizer(text)
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.graph: str | None = None  # TriG graph context; None = default
        self.triples: list[tuple] = []
        self._bnode_seq = 0
        self._pushback: list[tuple] = []

    # -- token helpers ------------------------------------------------------
    def _next(self):
        if self._pushback:
            return self._pushback.pop()
        return self.tz.next()

    def _push(self, tok) -> None:
        self._pushback.append(tok)

    def _expect_punct(self, ch: str) -> None:
        tok = self._next()
        if tok != ("punct", ch):
            raise TurtleSyntaxError(f"expected {ch!r}, got {tok}")

    def _fresh_bnode(self) -> str:
        self._bnode_seq += 1
        return f"_:genid{self._bnode_seq}"

    def _resolve_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise TurtleSyntaxError(f"unknown prefix {pfx!r}")
        local = re.sub(r"\\(.)", r"\1", local)  # PN_LOCAL_ESC
        return self.prefixes[pfx] + local

    # -- grammar ------------------------------------------------------------
    def parse(self) -> list[tuple]:
        while True:
            tok = self._next()
            if tok is None:
                return self.triples
            kind, val = tok[0], tok[1]
            if kind == "kw" and val in ("@prefix", "@base") or (
                kind == "kw" and val.upper() in ("PREFIX", "BASE")
            ):
                self._directive(val)
                continue
            # TriG: GRAPH <label> { ... }
            if kind == "kw" and val.upper() == "GRAPH":
                label = self._node(as_subject=True)
                self._expect_punct("{")
                self._graph_block(label[0])
                continue
            self._push(tok)
            subj = self._node(as_subject=True)
            nxt = self._next()
            # TriG shorthand: <label> { ... } (no GRAPH keyword)
            if nxt == ("punct", "{"):
                self._graph_block(subj[0])
                continue
            self._push(nxt)
            self._predicate_object_list(subj[0])
            self._expect_punct(".")

    def _graph_block(self, graph: str) -> None:
        prev = self.graph
        self.graph = graph
        while True:
            tok = self._next()
            if tok == ("punct", "}"):
                break
            if tok is None:
                raise TurtleSyntaxError("unterminated graph block")
            self._push(tok)
            s = self._node(as_subject=True)
            self._predicate_object_list(s[0])
            tok = self._next()
            if tok == ("punct", "."):
                continue
            if tok == ("punct", "}"):
                break
            raise TurtleSyntaxError(f"expected '.' or '}}' in graph, got {tok}")
        self.graph = prev

    def _directive(self, kw: str) -> None:
        sparql = not kw.startswith("@")
        if kw.lstrip("@").lower() == "prefix":
            ptok = self._next()
            if ptok[0] != "pname" or not ptok[1].endswith(":"):
                raise TurtleSyntaxError(f"bad prefix name {ptok}")
            iritok = self._next()
            if iritok[0] != "iri":
                raise TurtleSyntaxError("prefix IRI expected")
            self.prefixes[ptok[1][:-1]] = self.base + iritok[1] if not _is_abs(
                iritok[1]
            ) else iritok[1]
        else:
            iritok = self._next()
            if iritok[0] != "iri":
                raise TurtleSyntaxError("base IRI expected")
            self.base = iritok[1]
        if not sparql:
            self._expect_punct(".")

    def _node(self, as_subject: bool = False):
        """→ (value, obj_type, lang, datatype)."""
        tok = self._next()
        if tok is None:
            raise TurtleSyntaxError("unexpected EOF")
        kind, val = tok[0], tok[1]
        if kind == "iri":
            return (val if _is_abs(val) else self.base + val, "uri", None, None)
        if kind == "pname":
            return (self._resolve_pname(val), "uri", None, None)
        if kind == "bnode":
            return (val, "bnode", None, None)
        if kind == "kw" and val == "a" and as_subject is False:
            # 'a' is only a predicate; handled in _predicate_object_list
            raise TurtleSyntaxError("'a' is not a node")
        if kind == "kw" and val in ("true", "false"):
            return (val, "literal", None,
                    "http://www.w3.org/2001/XMLSchema#boolean")
        if kind == "num":
            if "e" in val.lower():
                dt = "http://www.w3.org/2001/XMLSchema#double"
            elif "." in val:
                dt = "http://www.w3.org/2001/XMLSchema#decimal"
            else:
                dt = "http://www.w3.org/2001/XMLSchema#integer"
            return (val, "literal", None, dt)
        if kind == "string":
            nxt = self._next()
            if nxt is not None and nxt[0] == "langtag":
                return (val, "literal", nxt[1], None)
            if nxt is not None and nxt[0] == "hathat":
                dtok = self._next()
                if dtok[0] == "iri":
                    dt = dtok[1] if _is_abs(dtok[1]) else self.base + dtok[1]
                elif dtok[0] == "pname":
                    dt = self._resolve_pname(dtok[1])
                else:
                    raise TurtleSyntaxError("datatype IRI expected")
                return (val, "literal", None, dt)
            if nxt is not None:
                self._push(nxt)
            return (val, "literal", None, None)
        if tok == ("punct", "["):
            nxt = self._next()
            bn = self._fresh_bnode()
            if nxt == ("punct", "]"):
                return (bn, "bnode", None, None)
            self._push(nxt)
            self._predicate_object_list(bn)
            self._expect_punct("]")
            return (bn, "bnode", None, None)
        if tok == ("punct", "("):
            return (self._collection(), "bnode", None, None)
        raise TurtleSyntaxError(f"unexpected token {tok}")

    def _collection(self) -> str:
        items = []
        while True:
            tok = self._next()
            if tok == ("punct", ")"):
                break
            self._push(tok)
            items.append(self._node())
        if not items:
            return RDF_NIL
        head = self._fresh_bnode()
        cur = head
        for k, (val, typ, lang, dt) in enumerate(items):
            self.triples.append((cur, RDF_FIRST, val, typ, lang, dt, self.graph))
            nxt = self._fresh_bnode() if k + 1 < len(items) else RDF_NIL
            nxt_t = "bnode" if k + 1 < len(items) else "uri"
            self.triples.append((cur, RDF_REST, nxt, nxt_t, None, None, self.graph))
            cur = nxt
        return head

    def _predicate_object_list(self, subj: str) -> None:
        while True:
            tok = self._next()
            if tok is None:
                raise TurtleSyntaxError("unexpected EOF in predicate list")
            if tok[0] == "kw" and tok[1] == "a":
                pred = RDF_TYPE
            elif tok[0] == "iri":
                pred = tok[1] if _is_abs(tok[1]) else self.base + tok[1]
            elif tok[0] == "pname":
                pred = self._resolve_pname(tok[1])
            else:
                raise TurtleSyntaxError(f"predicate expected, got {tok}")
            while True:
                val, typ, lang, dt = self._node()
                self.triples.append((subj, pred, val, typ, lang, dt, self.graph))
                nxt = self._next()
                if nxt == ("punct", ","):
                    continue
                break
            if nxt == ("punct", ";"):
                peeked = self._next()
                # trailing ';' before '.' or ']' is legal
                if peeked in (("punct", "."), ("punct", "]")):
                    self._push(peeked)
                    return
                self._push(peeked)
                continue
            self._push(nxt)
            return


def _is_abs(iri: str) -> bool:
    return bool(re.match(r"[A-Za-z][A-Za-z0-9+.\-]*:", iri))


def parse_turtle(text: str) -> list[tuple]:
    """text → [(subj, pred, obj, obj_type, lang, datatype)]."""
    return [t[:6] for t in _Parser(text).parse()]


def parse_trig(text: str) -> list[tuple]:
    """TriG text → [(subj, pred, obj, obj_type, lang, datatype, graph)] —
    the Turtle grammar plus GRAPH/label blocks; `graph` is NULL for
    default-graph statements, so every Turtle document is also valid
    TriG input."""
    return _Parser(text).parse()


TURTLE_SCHEMA = "subj string, pred string, obj string, obj_type string, lang string, datatype string"
TRIG_SCHEMA = TURTLE_SCHEMA + ", graph string"


def _read_text_parts(path: str, header_name: str) -> str:
    chunks: list[str] = []
    if os.path.isdir(path):
        header = os.path.join(path, header_name)
        if os.path.exists(header):
            with open(header) as fh:
                chunks.append(fh.read())
        for name in sorted(os.listdir(path)):
            if name.startswith(("part-",)) and not name.endswith(".crc"):
                with open(os.path.join(path, name)) as fh:
                    chunks.append(fh.read())
    else:
        with open(path) as fh:
            chunks.append(fh.read())
    return "\n".join(chunks)


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Parse a .ttl file — or a directory written by sinks.write_turtle
    (``_header.ttl`` sidecar + part files) — into the engine's triple
    schema. Driver-side by design (see module docstring)."""
    rows = parse_turtle(_read_text_parts(path, "_header.ttl"))
    return spark.createDataFrame(rows, TURTLE_SCHEMA)


def read_trig(spark: SparkSession, path: str) -> DataFrame:
    """TriG file or sinks.write_trig directory → triples + graph column."""
    rows = parse_trig(_read_text_parts(path, "_header.trig"))
    return spark.createDataFrame(rows, TRIG_SCHEMA)
