from .exports import (
    CURIE_EXPANSIONS,
    expand_curie_col,
    to_ntriples_lines,
    to_nquads_lines,
    to_turtle_lines,
    turtle_header,
    write_ntriples,
    write_nquads,
    write_turtle,
    write_tabular,
    write_sssom,
    sssom_rows,
)

__all__ = [
    "CURIE_EXPANSIONS",
    "expand_curie_col",
    "to_ntriples_lines",
    "to_nquads_lines",
    "to_turtle_lines",
    "turtle_header",
    "write_nquads",
    "write_turtle",
    "write_ntriples",
    "write_tabular",
    "write_sssom",
    "sssom_rows",
]
