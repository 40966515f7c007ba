"""Broadcast Bloom-filter prefilter for benchmark decontamination.

`operators/decontaminate.py` screens the corpus with an inverted-index
join on the shingle key. At 100 TB the cheaper first pass is a Bloom
filter of the benchmark shingle set carried INTO THE PLAN as a literal
hex bitmap (m bits = m/4 hex chars — a few KB for any realistic
benchmark suite): corpus shingles are tested map-only inside codegen,
and only the tiny bloom-positive remainder reaches the exact join that
removes false positives.  Semantics are exactly the plain join's —
Bloom filters have no false negatives by construction, which the oracle
parity check proves on every run (the DuckDB mirror computes the same
k-cell membership relationally; identical candidate sets or the hash
differs).

Hashing: the same md5-60-bit family as the count-min sketch
(sketch.py:cms_cell) — k independent rows index ONE m-bit array,
nibble-packed MSB-first into lowercase hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col
from .sketch import cms_cell


def build_bloom_hex(cells: list[int], m: int) -> str:
    """Pack set bits into an m-bit, MSB-first-nibble lowercase hex string."""
    nib = [0] * (m // 4)
    for c in cells:
        nib[c // 4] |= 8 >> (c % 4)
    return "".join("0123456789abcdef"[v] for v in nib)


def bloom_member_col(item: F.Column, bitmap_hex: str, k: int, m: int) -> F.Column:
    """True iff all k md5 cells of `item` are set in the literal bitmap.

    The bitmap enters as a foldable `split(lit(hex),'')` char array;
    per-cell test = element_at(nibble) & MSB-first mask — all JVM-side,
    no Python, no join."""
    chars = F.split(F.lit(bitmap_hex), "")
    masks = F.lit([8, 4, 2, 1])
    cond = F.lit(True)
    for r in range(k):
        cell = cms_cell(item, F.lit(r), m)
        nib = F.conv(F.element_at(chars, (cell / 4).cast("int") + 1), 16, 10).cast(
            "int"
        )
        mask = F.element_at(masks, (cell % 4).cast("int") + 1)
        cond = cond & (nib.bitwiseAND(mask) > 0)
    return cond


def bloom_contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    k: int = 3,
    m: int = 16384,
) -> DataFrame:
    """(doc_id, n_candidates, n_real): bloom-positive distinct shingles
    per corpus doc, and how many of those are true benchmark overlaps
    (the exact-join confirmation). n_real < n_candidates rows are the
    filter's false positives — visible, never silently kept."""
    bench_sh = benchmark.select(
        F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh")
    ).distinct()
    cell_rows = bench_sh.select(
        *[cms_cell(F.col("sh"), F.lit(r), m).alias(f"c{r}") for r in range(k)]
    ).collect()
    cells = sorted({row[f"c{i}"] for row in cell_rows for i in range(k)})
    bitmap = build_bloom_hex(cells, m)

    corpus_sh = corpus.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh")
    )
    cand = corpus_sh.where(bloom_member_col(F.col("sh"), bitmap, k, m))
    n_cand = cand.groupBy(id_col).agg(F.count("*").cast("long").alias("n_candidates"))
    n_real = (
        cand.join(bench_sh, "sh")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_real"))
    )
    return (
        n_cand.join(n_real, id_col, "left")
        .select(
            id_col,
            "n_candidates",
            F.coalesce("n_real", F.lit(0).cast("long")).alias("n_real"),
        )
    )
