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


def bloom_fpr_audit(
    train_items: DataFrame,
    probe_items: DataFrame,
    item_col: str,
    configs: tuple[tuple[int, int], ...] = ((12, 2), (12, 4), (16, 4)),
) -> DataFrame:
    """Bloom-filter sizing audit: the MEASURED false-positive rate of
    the relational k-cell membership test for several (log2 m, k)
    candidate configurations, against ground truth — the number that
    picks m and k before `bloom_contamination_report` ships a bitmap
    into a 100 TB scan (theory says FPR ≈ (1−e^(−kn/m))^k; this
    measures it on the actual key distribution, hash family included).

    One relational plan for ALL configs: the config table and the k
    hash rows explode against the distinct item sets; the train side's
    distinct (config, cell) pairs are the bitmap relation, the probe
    side (true negatives only — probe items anti-joined against train)
    matches cells with ONE equi-join, and an item false-positives iff
    all k of its hash rows matched.  Hashing is the cms_cell md5
    family verbatim, so any engine reproduces the bit pattern.

    Output per config: (log2m, k, n_train, bits_set, fill_micro,
    n_probe_neg, n_fp, fpr_micro).
    """
    cfg = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(m2)).alias("log2m"), F.lit(int(k)).alias("k")
                )
                for m2, k in configs
            ]
        )
    ).alias("_cfg")

    def cells(items: DataFrame) -> DataFrame:
        # `items` is already a distinct one-column frame named `_i`
        return (
            items.select("_i", cfg)
            .select("_i", "_cfg.log2m", "_cfg.k")
            .select(
                "_i",
                "log2m",
                "k",
                F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("_j"),
            )
            .select(
                "_i",
                "log2m",
                "k",
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("_j").cast("string"),
                                    F.lit("|"),
                                    F.col("_i").cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.expr("shiftleft(CAST(1 AS BIGINT), log2m)")
                ).alias("_cell"),
            )
        )

    train = train_items.select(F.col(item_col).alias("_i")).distinct()
    bitmap = (
        cells(train)
        .select("log2m", "k", "_cell")
        .distinct()
    )
    stats_train = bitmap.groupBy("log2m", "k").agg(
        F.count("*").cast("long").alias("bits_set")
    )
    n_train = train.count()
    probe_neg = (
        probe_items.select(F.col(item_col).alias("_i"))
        .distinct()
        .join(train, "_i", "left_anti")
    )
    matched = (
        cells(probe_neg)
        .join(bitmap, ["log2m", "k", "_cell"])
        .groupBy("log2m", "k", "_i")
        .agg(F.count("*").alias("_hits"))
    )
    fp = (
        matched.where(F.col("_hits") == F.col("k"))
        .groupBy("log2m", "k")
        .agg(F.count("*").cast("long").alias("n_fp"))
    )
    n_neg = probe_neg.count()
    base = (
        stats_train.join(fp, ["log2m", "k"], "left")
        .select(
            F.col("log2m").cast("long").alias("log2m"),
            F.col("k").cast("long").alias("k"),
            F.lit(int(n_train)).cast("long").alias("n_train"),
            "bits_set",
            F.round(
                F.col("bits_set")
                * F.lit(1_000_000)
                / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(log2m AS INT))")
            )
            .cast("long")
            .alias("fill_micro"),
            F.lit(int(n_neg)).cast("long").alias("n_probe_neg"),
            F.coalesce(F.col("n_fp"), F.lit(0)).cast("long").alias("n_fp"),
        )
        .withColumn(
            # no true negatives to probe (tiny/fully-overlapping corpora)
            # -> FPR undefined, NULL instead of an ANSI divide-by-zero
            "fpr_micro",
            F.when(
                F.col("n_probe_neg") > 0,
                F.round(
                    F.col("n_fp") * F.lit(1_000_000) / F.col("n_probe_neg")
                ).cast("long"),
            ),
        )
    )
    return base
