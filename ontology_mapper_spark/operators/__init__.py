from .comparator import compare_sources
from .dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_band_pairs,
    simhash64,
    ngram_jaccard_pairs,
)
from .similarity import cosine_topk_bruteforce, lsh_bucketed_topk
from .textstats import with_text_stats, with_quality_score, with_lang_guess, with_fingerprint
from .topk import priority_dedup, grouped_topk

__all__ = [
    "compare_sources",
    "exact_dedup",
    "minhash_signatures",
    "minhash_band_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "lsh_bucketed_topk",
    "with_text_stats",
    "with_quality_score",
    "with_lang_guess",
    "with_fingerprint",
    "priority_dedup",
    "grouped_topk",
]
