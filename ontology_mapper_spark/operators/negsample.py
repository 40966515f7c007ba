"""Deterministic filtered negative sampling for KG-embedding training.

TransE/DistMult-style training needs k corrupted triples per positive:
replace the object with a pseudo-random entity, drop corruptions that
are accidentally true ("filtered" setting, Bordes et al. 2013).  A
100 TB pipeline cannot use an RNG (resumability + oracle parity), so
the sample index is md5-derived from the triple itself:

    r = int(md5(subj ␟ pred ␟ obj ␟ i)[:8], 16) % |vocab|

and the entity vocabulary is md5-ranked into a dense [0, n) index.

Scale shape: the dense md5-rank over the vocabulary is a TWO-PHASE
rank, never a global window.  md5 is uniform, so the first two hex
chars split the vocab into 256 near-equal buckets: per-bucket counts
roll into exclusive offsets (a window over the ≤256-row bucket
histogram), and each row's global rank is its bucket offset plus a
row_number partitioned BY bucket — bucket-prefix ordering makes the
concatenation identical to the single global `ORDER BY md5` (entity
vocabularies are ~10⁶–10⁸; at that size a single-partition window is
one executor sorting the vocab).  The indexed vocab then
broadcast-joins back on the sampled index.  The positives side is
map-only explode×k, one broadcast join, and one anti-join against the
positive set keyed (subj, pred, obj) — all AQE-friendly equi-joins,
no RNG, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SEP = "\x1f"


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """≤k filtered corrupted-object negatives per positive triple.

    Output: (subj, pred, pos_obj, neg_i, neg_obj).  "≤k": corruptions
    that collide with ANY true object of the same (subj, pred) are
    dropped, per the standard filtered protocol — deterministic on both
    engines, no resample loop.
    """
    pos = triples.select(subj_col, pred_col, obj_col).distinct()
    hashed = (
        pos.select(F.col(obj_col).alias("_neg_obj"))
        .distinct()
        .withColumn("_h", F.md5(F.col("_neg_obj")))
        .withColumn("_b", F.substring(F.col("_h"), 1, 2))
    )
    # two-phase global md5 rank: exclusive offsets over the 256-bucket
    # histogram, then a bucket-partitioned row_number.  Lexicographic
    # bucket order is a prefix of the full md5 order, so offset +
    # within-bucket rank == the global ORDER BY md5 rank exactly.
    wb_hist = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        hashed.groupBy("_b")
        .agg(F.count("*").cast("long").alias("_bn"))
        .select(
            "_b",
            F.coalesce(F.sum("_bn").over(wb_hist), F.lit(0))
            .cast("long")
            .alias("_off"),
        )
    )
    win_b = Window.partitionBy("_b").orderBy("_h")
    vocab = hashed.join(F.broadcast(offsets), "_b").select(
        "_neg_obj",
        (F.col("_off") + F.row_number().over(win_b) - 1)
        .cast("long")
        .alias("_idx"),
    )
    n = vocab.groupBy().agg(F.count("*").cast("long").alias("_n"))
    expanded = (
        pos.crossJoin(F.broadcast(n))
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("_i"),
        )
        .withColumn("neg_i", F.col("_i").cast("long"))
        .drop("_i")
        .withColumn(
            "_r",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            _SEP,
                            F.col(subj_col),
                            F.col(pred_col),
                            F.col(obj_col),
                            F.col("neg_i").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("_n"),
        )
    )
    cand = expanded.join(F.broadcast(vocab), expanded["_r"] == vocab["_idx"]).select(
        F.col(subj_col),
        F.col(pred_col),
        F.col(obj_col).alias("pos_obj"),
        "neg_i",
        F.col("_neg_obj").alias("neg_obj"),
    )
    truth = pos.select(
        F.col(subj_col), F.col(pred_col), F.col(obj_col).alias("neg_obj")
    )
    return cand.join(truth, [subj_col, pred_col, "neg_obj"], "left_anti").select(
        subj_col, pred_col, "pos_obj", "neg_i", "neg_obj"
    )
