from .rdf import (
    SUPPORTED_INPUT_FORMATS,
    detect_format,
    read_ntriples,
    read_rdf,
    read_selections_json,
    read_concept_list,
)
from .turtle import parse_turtle, read_turtle

__all__ = [
    "SUPPORTED_INPUT_FORMATS",
    "detect_format",
    "read_ntriples",
    "read_rdf",
    "read_selections_json",
    "read_concept_list",
    "parse_turtle",
    "read_turtle",
]
