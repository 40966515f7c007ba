"""Key / identifier Column expressions (cache keys, CURIE expansion, URI ops)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..oracle.semantics import CURIE_PREFIX_MAP


def cache_key_col(query: Column, ontologies: Column, service: Column) -> Column:
    """sha256('lower(trim(q))|UPPER(TRIM(o))|lower(service)') hex digest.

    Mirrors cache/cache_manager.py:41-54. concat_ws would skip nulls and
    change the layout, so inputs are coalesced to '' first.
    """
    q = F.lower(F.trim(F.coalesce(query, F.lit(""))))
    o = F.upper(F.trim(F.coalesce(ontologies, F.lit(""))))
    s = F.lower(F.coalesce(service, F.lit("")))
    return F.sha2(F.concat(q, F.lit("|"), o, F.lit("|"), s), 256)


def curie_to_iri_col(curie: Column) -> Column:
    """CURIE -> IRI: 8-prefix map + OBO-purl default; no-colon passthrough.

    Mirrors core/schema_parser.py:213-233."""
    prefix = F.substring_index(curie, ":", 1)
    # everything after the FIRST colon (split(':', 1) in the reference)
    local = curie.substr(F.length(prefix) + F.lit(2), F.length(curie))
    pairs: list[Column] = []
    for p, base in CURIE_PREFIX_MAP.items():
        pairs.extend([F.lit(p), F.lit(base)])
    known = F.element_at(F.create_map(*pairs), prefix)
    base = F.coalesce(known, F.concat(F.lit("http://purl.obolibrary.org/obo/"), prefix, F.lit("_")))
    return F.when(curie.contains(":"), F.concat(base, local)).otherwise(curie)


def ontology_acronym_col(links: Column) -> Column:
    """P6: ontology acronym from an array of API link strings — the FIRST
    link containing '/ontologies/' wins (the reference's loop-break,
    services/bioportal.py:73-77), and within it the segment after the LAST
    '/ontologies/' up to the next '/' (split('/ontologies/')[-1]
    .split('/')[0]). '' when no link qualifies."""
    first = F.element_at(
        F.filter(links, lambda x: x.contains("/ontologies/")), 1
    )
    return F.coalesce(
        F.regexp_extract(first, r".*/ontologies/([^/]*)", 1), F.lit("")
    )


def uri_fragment_col(uri: Column) -> Column:
    """str(uri).split('#')[-1] — core/parser.py:113,120-121."""
    return F.substring_index(uri, "#", -1)


def label_from_key_col(key: Column) -> Column:
    """key.replace('_',' ') — core/parser.py:125."""
    return F.translate(key, "_", " ")
