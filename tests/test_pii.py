"""PII redaction: semantics + map-only plan."""

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.pii import redact_pii


def test_redact_pii_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@sub.example.org thanks"),
            (2, "server 192.168.001.7 went down, call +1-800-0199"),
            (3, "nothing sensitive here"),
            (4, "two mails a@b.co c@d.io and ip 10.0.0.1"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "text", "doc_id").collect()}
    assert out[1]["n_email"] == 1 and out[1]["redacted"] == "mail me at <EMAIL> thanks"
    assert out[2]["n_ip"] == 1 and out[2]["n_phone"] == 1
    assert out[2]["redacted"] == "server <IP> went down, call <PHONE>"
    assert out[3]["n_email"] == out[3]["n_ip"] == out[3]["n_phone"] == 0
    assert out[3]["delta_chars"] == 0
    assert out[4]["n_email"] == 2 and out[4]["n_ip"] == 1
    assert "<EMAIL>" in out[4]["redacted"] and "<IP>" in out[4]["redacted"]
    # counts and replacement use the same patterns: zero counts <=> zero delta
    for r in out.values():
        zero = r["n_email"] + r["n_ip"] + r["n_phone"] == 0
        assert zero == (r["delta_chars"] == 0)


def test_redact_pii_plan_is_map_only(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@x.com")).alias(
            "text"
        ),
    )
    plan = redact_pii(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
