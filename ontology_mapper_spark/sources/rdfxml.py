"""S1 extension — RDF/XML reader + writer (no rdflib; stdlib ElementTree).

Same positioning as sources/turtle.py: the reference loads RDF/XML through
rdflib in-memory (core/parser.py:105-133); ontology files are config-sized,
so a driver-side parse is the honest scale story, with the parquet triples
table as the cluster representation.

Reader subset (covers OWL/RDFS ontology exports):
* rdf:Description and typed node elements (→ rdf:type triple);
* subjects via rdf:about / rdf:ID (resolved against xml:base) /
  rdf:nodeID / anonymous (fresh bnode);
* property elements with rdf:resource / rdf:nodeID / rdf:datatype /
  inherited xml:lang / text literals / nested node elements /
  rdf:parseType="Resource" / rdf:parseType="Collection";
* property ATTRIBUTES on node elements (the compact literal form).

Writer: one rdf:Description per subject with property elements — a
driver-side convenience for small graphs (XML needs a single document
wrapper, so it cannot be a parallel sink; the cluster-writable RDF
surfaces are NT/NQ/Turtle/TriG lines).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
_RDF = "{" + RDF_NS + "}"
_XML_LANG = "{" + XML_NS + "}lang"
_XML_BASE = "{" + XML_NS + "}base"

# node-element attributes that are NOT property attributes
_SPECIAL_ATTRS = {
    _RDF + "about", _RDF + "ID", _RDF + "nodeID", _RDF + "resource",
    _RDF + "datatype", _RDF + "parseType", _XML_LANG, _XML_BASE,
}


class _XmlParser:
    def __init__(self) -> None:
        self.triples: list[tuple] = []
        self._bnode_seq = 0

    def _fresh(self) -> str:
        self._bnode_seq += 1
        return f"_:genid{self._bnode_seq}"

    def parse(self, text: str) -> list[tuple]:
        root = ET.fromstring(text)
        base = root.get(_XML_BASE, "")
        lang = root.get(_XML_LANG)
        nodes = [root] if root.tag != _RDF + "RDF" else list(root)
        for el in nodes:
            self._node_element(el, base, lang)
        return self.triples

    def _emit(self, s, p, o, t, lang=None, dt=None) -> None:
        self.triples.append((s, p, o, t, lang, dt))

    def _subject_of(self, el, base: str) -> tuple[str, str]:
        if el.get(_RDF + "about") is not None:
            return el.get(_RDF + "about"), "uri"
        if el.get(_RDF + "ID") is not None:
            return base + "#" + el.get(_RDF + "ID"), "uri"
        if el.get(_RDF + "nodeID") is not None:
            return "_:" + el.get(_RDF + "nodeID"), "bnode"
        return self._fresh(), "bnode"

    def _node_element(self, el, base: str, lang: str | None) -> tuple[str, str]:
        base = el.get(_XML_BASE, base)
        lang = el.get(_XML_LANG, lang)
        subj, styp = self._subject_of(el, base)
        if el.tag != _RDF + "Description":
            self._emit(subj, RDF_NS + "type", _iri_of_tag(el.tag), "uri")
        for k, v in el.attrib.items():
            if k not in _SPECIAL_ATTRS and not k.startswith(_RDF):
                self._emit(subj, _iri_of_tag(k), v, "literal", lang)
        for prop in el:
            self._property_element(subj, prop, base, lang)
        return subj, styp

    def _property_element(self, subj, prop, base: str, lang: str | None) -> None:
        pred = _iri_of_tag(prop.tag)
        lang = prop.get(_XML_LANG, lang)
        parse_type = prop.get(_RDF + "parseType")
        if parse_type == "Resource":
            bn = self._fresh()
            self._emit(subj, pred, bn, "bnode")
            for inner in prop:
                self._property_element(bn, inner, base, lang)
            return
        if parse_type == "Collection":
            items = [self._node_element(c, base, lang) for c in prop]
            if not items:
                self._emit(subj, pred, RDF_NS + "nil", "uri")
                return
            head = self._fresh()
            self._emit(subj, pred, head, "bnode")
            cur = head
            for i, (val, typ) in enumerate(items):
                self._emit(cur, RDF_NS + "first", val, typ)
                last = i + 1 == len(items)
                nxt = RDF_NS + "nil" if last else self._fresh()
                self._emit(cur, RDF_NS + "rest", nxt, "uri" if last else "bnode")
                cur = nxt
            return
        if prop.get(_RDF + "resource") is not None:
            self._emit(subj, pred, prop.get(_RDF + "resource"), "uri")
            return
        if prop.get(_RDF + "nodeID") is not None:
            self._emit(subj, pred, "_:" + prop.get(_RDF + "nodeID"), "bnode")
            return
        children = list(prop)
        if children:
            val, typ = self._node_element(children[0], base, lang)
            self._emit(subj, pred, val, typ)
            return
        dt = prop.get(_RDF + "datatype")
        self._emit(subj, pred, prop.text or "", "literal",
                   None if dt else lang, dt)


def _iri_of_tag(tag: str) -> str:
    # ElementTree expands namespaces to {ns}local
    return tag[1:].replace("}", "") if tag.startswith("{") else tag


def parse_rdfxml(text: str) -> list[tuple]:
    """text → [(subj, pred, obj, obj_type, lang, datatype)]."""
    return _XmlParser().parse(text)


RDFXML_SCHEMA = (
    "subj string, pred string, obj string, obj_type string, "
    "lang string, datatype string"
)


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    with open(path) as fh:
        rows = parse_rdfxml(fh.read())
    return spark.createDataFrame(rows, RDFXML_SCHEMA)


def _split_iri(iri: str) -> tuple[str, str]:
    """(namespace, local) split at the last '#' or '/'."""
    for sep in ("#", "/"):
        k = iri.rfind(sep)
        if k > 0 and k + 1 < len(iri):
            return iri[: k + 1], iri[k + 1 :]
    return iri, ""


def _guard_doc_form(
    triples: DataFrame, max_triples: int, allow_large: bool, op: str
) -> None:
    """Refuse to collect() an unbounded graph into one document. Cheap:
    limit(N+1).count() never scans past the bound."""
    if allow_large:
        return
    n = triples.limit(max_triples + 1).count()
    if n > max_triples:
        raise ValueError(
            f"{op} builds ONE document on the driver and the graph has "
            f">{max_triples} triples; use the distributed line-oriented "
            f"sinks (NT/NQ/TriG/JSON-LD-lines) or pass allow_large=True "
            f"if you really mean it"
        )


def write_rdfxml(
    triples: DataFrame,
    path: str,
    max_triples: int = 1_000_000,
    allow_large: bool = False,
) -> None:
    """Driver-side RDF/XML document: rdf:Description per subject.

    Predicates stored as CURIEs are expanded via the sink prefix table
    first. Small-graph convenience only (see module docstring): a single
    XML document is inherently one file built in one process, so this
    collect()s — the size gate makes that an explicit contract (refuses
    > `max_triples` unless `allow_large=True`), same pattern as
    exact_neardup_pairs. Big graphs belong in the distributed
    line-oriented sinks (NT/NQ/TriG/JSON-LD-lines)."""
    from ..sinks.exports import CURIE_EXPANSIONS

    _guard_doc_form(triples, max_triples, allow_large, "write_rdfxml")

    def expand(p: str) -> str:
        for pfx, ns in CURIE_EXPANSIONS.items():
            if p.startswith(pfx):
                return ns + p[len(pfx):]
        return p

    rows = triples.select("subj", "pred", "obj", "obj_type", "lang").collect()
    ET.register_namespace("rdf", RDF_NS)
    seen_ns: dict[str, str] = {}
    root = ET.Element(_RDF + "RDF")
    by_subj: dict[str, list] = {}
    for r in rows:
        by_subj.setdefault(r["subj"], []).append(r)
    for subj in sorted(by_subj):
        desc = ET.SubElement(root, _RDF + "Description")
        desc.set(_RDF + "about", subj)
        for r in sorted(
            by_subj[subj], key=lambda x: (x["pred"], str(x["obj"]))
        ):
            iri = expand(r["pred"])
            ns, local = _split_iri(iri)
            if not local:  # unsplittable predicate IRI — rare
                ns, local = RDF_NS, "value"
            if ns not in seen_ns:
                # 'nsN' prefixes are reserved by ElementTree internals
                seen_ns[ns] = f"p{len(seen_ns)}"
                ET.register_namespace(seen_ns[ns], ns)
            pel = ET.SubElement(desc, "{" + ns + "}" + local)
            if r["obj_type"] == "uri":
                pel.set(_RDF + "resource", r["obj"])
            else:
                pel.text = r["obj"]
                if r["lang"]:
                    pel.set(_XML_LANG, r["lang"])
    ET.ElementTree(root).write(path, encoding="unicode", xml_declaration=True)
