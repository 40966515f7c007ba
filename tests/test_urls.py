"""URL canonicalization: rule semantics + map-only canonical stage."""

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.urls import canonical_url, canonicalize_urls


def test_canonical_url_rules(spark):
    cases = [
        # (raw, expected canonical)
        ("HTTP://WWW.Example.COM:80/Path/A/?utm_source=x",
         "http://example.com/Path/A"),
        ("https://example.com:443/Path/A#frag",
         "https://example.com/Path/A"),
        ("http://example.com/Path/A?ref=y&q=1",
         "http://example.com/Path/A?q=1"),
        # path case is preserved, only scheme+host lowered
        ("HtTpS://ExAmPlE.org/KeepCase", "https://example.org/KeepCase"),
        # root slash is NOT stripped
        ("http://example.com/", "http://example.com/"),
        # tracking param in the middle of the query
        ("http://a.com/p?utm_medium=m&keep=1", "http://a.com/p?keep=1"),
        # non-default port survives
        ("http://a.com:8080/p", "http://a.com:8080/p"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], ["i", "url"]
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_dedup_key_collapses_scheme(spark):
    df = spark.createDataFrame(
        [
            (1, "http://example.com/p"),
            (2, "https://example.com/p"),
            (3, "https://WWW.example.com:443/p/"),
            (4, "http://example.com/other"),
        ],
        ["doc_id", "url"],
    )
    out = {r["doc_id"]: r for r in canonicalize_urls(df, "url", "doc_id").collect()}
    assert out[1]["dedup_key"] == out[2]["dedup_key"] == out[3]["dedup_key"]
    assert not out[1]["is_dup_of_earlier"]  # first-seen by total order on id
    assert out[2]["is_dup_of_earlier"] and out[3]["is_dup_of_earlier"]
    assert not out[4]["is_dup_of_earlier"]


def test_canonical_stage_is_map_only(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://s"), F.col("id").cast("string"),
                 F.lit(".com/p")).alias("url"),
    )
    # the canonical/key projection itself must not shuffle or hit Python;
    # the first-seen flag adds exactly the one window exchange it needs
    plan = (
        df.select(canonical_url(F.col("url")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
