from .exports import (
    CURIE_EXPANSIONS,
    expand_curie_col,
    to_ntriples_lines,
    write_ntriples,
    write_tabular,
    write_sssom,
    sssom_rows,
)

__all__ = [
    "CURIE_EXPANSIONS",
    "expand_curie_col",
    "to_ntriples_lines",
    "write_ntriples",
    "write_tabular",
    "write_sssom",
    "sssom_rows",
]
