from .rdf import (
    SUPPORTED_INPUT_FORMATS,
    detect_format,
    read_ntriples,
    read_selections_json,
    read_concept_list,
)

__all__ = [
    "SUPPORTED_INPUT_FORMATS",
    "detect_format",
    "read_ntriples",
    "read_selections_json",
    "read_concept_list",
]
