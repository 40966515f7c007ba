"""S1 extension — JSON-LD reader + writer (no rdflib; stdlib json).

Subset expansion algorithm (covers the flat/compacted documents ontology
tooling emits):

* @context: prefix→IRI strings, term definitions (plain string or
  {"@id": ..., "@type": "@id"}), @vocab, @base;
* nodes: {"@id", "@type" (string or list), term: value...}; top-level
  node, list of nodes, or {"@graph": [...]};
* values: string/number/bool literals, {"@value", "@language", "@type"},
  {"@id": ...} references, nested node objects (emitted + referenced),
  arrays (multi-valued), {"@list": [...]} → rdf:first/rest chains;
* CURIEs and terms expanded through the context; absolute IRIs pass.

Writer: a single compacted document {"@context", "@graph": [node...]}
grouped by subject — driver-side convenience (one JSON document cannot be
written in parallel parts); the cluster-writable exports stay the line
sinks. `to_jsonld_lines` is the distributed alternative: one expanded
node object per line (JSON-lines, each line independently parseable).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"


class _JsonLdParser:
    def __init__(self, context: dict | None = None) -> None:
        self.terms: dict[str, dict] = {}
        self.vocab = ""
        self.base = ""
        self.triples: list[tuple] = []
        self._bnode_seq = 0
        if context:
            self._load_context(context)

    def _fresh(self) -> str:
        self._bnode_seq += 1
        return f"_:genid{self._bnode_seq}"

    def _load_context(self, ctx) -> None:
        if isinstance(ctx, list):
            for c in ctx:
                self._load_context(c)
            return
        for k, v in ctx.items():
            if k == "@vocab":
                self.vocab = v
            elif k == "@base":
                self.base = v
            elif isinstance(v, str):
                self.terms[k] = {"@id": v}
            elif isinstance(v, dict):
                self.terms[k] = v

    def _expand(self, term: str, vocab_fallback: bool = True) -> str | None:
        if term.startswith("@"):
            return None
        if term in self.terms:
            return self.terms[term]["@id"]
        if ":" in term:
            pfx, _, local = term.partition(":")
            if pfx in self.terms:
                return self.terms[pfx]["@id"] + local
            if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*$", pfx):
                return term  # absolute IRI (or bnode _:x)
        if vocab_fallback and self.vocab:
            return self.vocab + term
        return None

    def _expand_ref(self, iri: str) -> str:
        if iri.startswith("_:"):
            return iri
        ex = self._expand(iri, vocab_fallback=False)
        if ex is not None and ":" in ex:
            return ex
        return self.base + iri

    def parse(self, doc) -> list[tuple]:
        if isinstance(doc, list):
            for node in doc:
                self._node(node)
            return self.triples
        if isinstance(doc, dict):
            if "@context" in doc:
                self._load_context(doc["@context"])
            if "@graph" in doc:
                for node in doc["@graph"]:
                    self._node(node)
                return self.triples
            if any(k for k in doc if k != "@context"):
                self._node(doc)
            return self.triples
        raise ValueError("JSON-LD document must be an object or array")

    def _node(self, obj: dict) -> tuple[str, str]:
        if "@id" in obj:
            subj = self._expand_ref(obj["@id"])
            styp = "bnode" if subj.startswith("_:") else "uri"
        else:
            subj, styp = self._fresh(), "bnode"
        for k, v in obj.items():
            if k in ("@context", "@id"):
                continue
            if k == "@type":
                for t in v if isinstance(v, list) else [v]:
                    self.triples.append(
                        (subj, RDF_TYPE, self._expand(t) or t, "uri", None, None)
                    )
                continue
            pred = self._expand(k)
            if pred is None:
                continue  # unmappable term — dropped, as in expansion
            tdef = self.terms.get(k, {})
            for val in v if isinstance(v, list) else [v]:
                self._value(subj, pred, val, tdef)
        return subj, styp

    def _value(self, subj: str, pred: str, val, tdef: dict) -> None:
        if isinstance(val, dict):
            if "@list" in val:
                items = val["@list"]
                if not items:
                    self.triples.append(
                        (subj, pred, RDF_NS + "nil", "uri", None, None)
                    )
                    return
                head = self._fresh()
                self.triples.append((subj, pred, head, "bnode", None, None))
                cur = head
                for i, item in enumerate(items):
                    self._value(cur, RDF_NS + "first", item, {})
                    last = i + 1 == len(items)
                    nxt = RDF_NS + "nil" if last else self._fresh()
                    self.triples.append(
                        (cur, RDF_NS + "rest", nxt,
                         "uri" if last else "bnode", None, None)
                    )
                    cur = nxt
                return
            if "@value" in val:
                dt = val.get("@type")
                self.triples.append(
                    (subj, pred, _lex(val["@value"]), "literal",
                     val.get("@language"), self._expand(dt) or dt if dt else None)
                )
                return
            if set(val) <= {"@id"}:
                ref = self._expand_ref(val["@id"])
                self.triples.append(
                    (subj, pred, ref,
                     "bnode" if ref.startswith("_:") else "uri", None, None)
                )
                return
            child, ctyp = self._node(val)
            self.triples.append((subj, pred, child, ctyp, None, None))
            return
        if isinstance(val, str) and tdef.get("@type") == "@id":
            ref = self._expand_ref(val)
            self.triples.append(
                (subj, pred, ref,
                 "bnode" if ref.startswith("_:") else "uri", None, None)
            )
            return
        if isinstance(val, bool):
            dt = "http://www.w3.org/2001/XMLSchema#boolean"
        elif isinstance(val, int):
            dt = "http://www.w3.org/2001/XMLSchema#integer"
        elif isinstance(val, float):
            dt = "http://www.w3.org/2001/XMLSchema#double"
        else:
            dt = None
        self.triples.append((subj, pred, _lex(val), "literal", None, dt))


def _lex(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def parse_jsonld(doc_or_text) -> list[tuple]:
    """dict/list/JSON text → [(subj, pred, obj, obj_type, lang, datatype)]."""
    doc = (
        json.loads(doc_or_text)
        if isinstance(doc_or_text, (str, bytes))
        else doc_or_text
    )
    return _JsonLdParser().parse(doc)


JSONLD_SCHEMA = (
    "subj string, pred string, obj string, obj_type string, "
    "lang string, datatype string"
)


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """Single JSON-LD document, or JSON-lines of node objects (one
    independently-parseable node per line — the distributed export form)."""
    with open(path) as fh:
        text = fh.read()
    stripped = text.lstrip()
    if stripped.startswith(("[", "{")):
        try:
            rows = parse_jsonld(text)
        except json.JSONDecodeError:
            rows = _parse_jsonl(text)
    else:
        rows = _parse_jsonl(text)
    return spark.createDataFrame(rows, JSONLD_SCHEMA)


def _parse_jsonl(text: str) -> list[tuple]:
    p = _JsonLdParser()
    for line in text.splitlines():
        line = line.strip()
        if line:
            p._node(json.loads(line))
    return p.triples


def write_jsonld(
    triples: DataFrame,
    path: str,
    max_triples: int = 1_000_000,
    allow_large: bool = False,
) -> None:
    """Driver-side compacted document {"@context", "@graph"} grouped by
    subject; CURIE predicates kept compact via the sink prefix table.

    A single JSON-LD document is one file built in one process, so this
    collect()s — size-gated (refuses > `max_triples` unless
    `allow_large=True`) to make the driver-side boundary explicit; use
    the distributed JSON-LD-lines sink for big graphs."""
    from .rdfxml import _guard_doc_form
    from ..sinks.exports import CURIE_EXPANSIONS

    _guard_doc_form(triples, max_triples, allow_large, "write_jsonld")

    context = {p.rstrip(":"): ns for p, ns in CURIE_EXPANSIONS.items()}
    rows = triples.select("subj", "pred", "obj", "obj_type", "lang").collect()
    nodes: dict[str, dict] = {}
    for r in sorted(rows, key=lambda x: (x["subj"], x["pred"], str(x["obj"]))):
        node = nodes.setdefault(r["subj"], {"@id": r["subj"]})
        if r["obj_type"] == "uri":
            val: object = {"@id": r["obj"]}
        elif r["lang"]:
            val = {"@value": r["obj"], "@language": r["lang"]}
        else:
            val = r["obj"]
        cur = node.get(r["pred"])
        if cur is None:
            node[r["pred"]] = val
        elif isinstance(cur, list):
            cur.append(val)
        else:
            node[r["pred"]] = [cur, val]
    doc = {"@context": context, "@graph": list(nodes.values())}
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)


def _jstr(c) -> F.Column:
    """JSON-encode a string Column (quotes + escapes) JVM-side: wrap it in
    a one-field struct, to_json, and strip the fixed '{"v":' / '}' frame."""
    j = F.to_json(F.struct(c.alias("v")))
    return j.substr(F.lit(6), F.length(j) - F.lit(6))


def to_jsonld_lines(triples: DataFrame) -> DataFrame:
    """(line) — one expanded node object per TRIPLE (single-property node
    objects are valid JSON-LD; consumers merge by @id). Fully distributed:
    pure Column JSON construction, no driver collection."""
    from ..sinks.exports import expand_curie_col

    obj_val = F.when(
        F.col("obj_type") == "uri",
        F.concat(F.lit('{"@id": '), _jstr(F.col("obj")), F.lit("}")),
    ).otherwise(
        F.when(
            F.col("lang").isNotNull(),
            F.concat(
                F.lit('{"@value": '), _jstr(F.col("obj")),
                F.lit(', "@language": '), _jstr(F.col("lang")), F.lit("}"),
            ),
        ).otherwise(_jstr(F.col("obj")))
    )
    line = F.concat(
        F.lit('{"@id": '),
        _jstr(F.col("subj")),
        F.lit(", "),
        _jstr(expand_curie_col(F.col("pred"))),
        F.lit(": "),
        obj_val,
        F.lit("}"),
    )
    return triples.select(line.alias("line"))
