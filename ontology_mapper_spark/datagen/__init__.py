from .snapshot import ontology_terms_rows, xrefs_rows, build_snapshot
from .transcripts import transcripts_rows, build_transcripts

__all__ = [
    "ontology_terms_rows",
    "xrefs_rows",
    "build_snapshot",
    "transcripts_rows",
    "build_transcripts",
]
