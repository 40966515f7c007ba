from .rdf import (
    SUPPORTED_INPUT_FORMATS,
    detect_format,
    read_ntriples,
    read_nquads,
    read_rdf,
    read_selections_json,
    read_concept_list,
)
from .turtle import parse_trig, parse_turtle, read_trig, read_turtle
from .rdfxml import parse_rdfxml, read_rdfxml, write_rdfxml
from .jsonld import (
    parse_jsonld,
    read_jsonld,
    to_jsonld_lines,
    write_jsonld,
)

__all__ = [
    "SUPPORTED_INPUT_FORMATS",
    "detect_format",
    "read_ntriples",
    "read_nquads",
    "read_rdf",
    "read_selections_json",
    "read_concept_list",
    "parse_turtle",
    "parse_trig",
    "read_turtle",
    "read_trig",
    "parse_rdfxml",
    "read_rdfxml",
    "write_rdfxml",
    "parse_jsonld",
    "read_jsonld",
    "to_jsonld_lines",
    "write_jsonld",
]
