"""Count-min sketch and Bloom decontamination invariants."""

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.bloom import (
    bloom_contamination_report,
    bloom_member_col,
    build_bloom_hex,
)
from ontology_mapper_spark.operators.decontaminate import contamination_report
from ontology_mapper_spark.operators.sketch import cms_cell, cms_estimates, cms_sketch


def test_cms_never_underestimates(spark):
    # zipf-ish weighted items
    items = spark.createDataFrame(
        [(f"w{i}", (1000 // (i + 1)) + 1) for i in range(300)],
        "w string, cnt long",
    )
    sk = cms_sketch(items, "w", "cnt", depth=4, width=64)
    # sketch mass per row == total mass (no loss)
    total = items.agg(F.sum("cnt")).first()[0]
    per_row = {r["r"]: r["s"] for r in sk.groupBy("r").agg(F.sum("cnt").alias("s")).collect()}
    assert set(per_row.values()) == {total}
    est = cms_estimates(items.select("w"), sk, "w", depth=4, width=64)
    joined = est.join(items, "w").collect()
    assert len(joined) == 300
    assert all(r["est_cnt"] >= r["cnt"] for r in joined)
    # the heaviest item's estimate is tight-ish (it dominates its cells)
    top = {r["w"]: r for r in joined}["w0"]
    assert top["est_cnt"] < top["cnt"] * 2


def test_bloom_membership_no_false_negatives(spark):
    vals = [f"item-{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "sh string")
    m, k = 4096, 3
    rows = df.select(
        *[cms_cell(F.col("sh"), F.lit(r), m).alias(f"c{r}") for r in range(k)]
    ).collect()
    cells = sorted({row[f"c{i}"] for row in rows for i in range(k)})
    bitmap = build_bloom_hex(cells, m)
    got = df.select(bloom_member_col(F.col("sh"), bitmap, k, m).alias("hit")).collect()
    assert all(r["hit"] for r in got)


def test_bloom_report_equals_exact_on_confirmed(spark):
    docs = []
    for i in range(40):
        words = " ".join(f"tok{(i * 13 + j) % 37}" for j in range(12))
        docs.append((i, words))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.where(F.col("doc_id") % 10 == 0)
    corpus = df.where(F.col("doc_id") % 10 != 0)
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_report(corpus, bench, "text", "doc_id", 3).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in bloom_contamination_report(
            corpus, bench, "text", "doc_id", 3, k=3, m=4096
        ).collect()
    }
    # every exact hit present with the same confirmed count; candidates ⊇ real
    for doc, n in exact.items():
        assert bloom[doc]["n_real"] == n
        assert bloom[doc]["n_candidates"] >= n
    # no doc reports confirmed overlaps the exact join doesn't have
    for doc, r in bloom.items():
        assert r["n_real"] == exact.get(doc, 0)
