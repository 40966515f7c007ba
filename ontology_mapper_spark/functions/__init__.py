from .align import alignment_predicate_col, alignment_type_col
from .keys import (
    cache_key_col,
    curie_to_iri_col,
    label_from_key_col,
    uri_fragment_col,
)
from .synonyms import dedupe_synonyms_col, top_synonyms_col
from .text import capitalize_first_col, clean_description_col, norm_label_col

__all__ = [
    "alignment_predicate_col",
    "alignment_type_col",
    "cache_key_col",
    "curie_to_iri_col",
    "label_from_key_col",
    "uri_fragment_col",
    "dedupe_synonyms_col",
    "top_synonyms_col",
    "capitalize_first_col",
    "clean_description_col",
    "norm_label_col",
]
