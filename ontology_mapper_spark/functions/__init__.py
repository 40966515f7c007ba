from .text import clean_description_col, norm_label_col, capitalize_first_col  # noqa: F401
from .align import alignment_type_col, alignment_predicate_col  # noqa: F401
from .keys import cache_key_col, curie_to_iri_col, uri_fragment_col, label_from_key_col  # noqa: F401
