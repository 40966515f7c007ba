"""Unit tests for the qb79-qb81 wave: quantile normalization,
lead-lag cross-correlation, growth accounting — closed-form cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import quantile_normalization
from ontology_mapper_spark.operators.temporal import (
    growth_accounting,
    lead_lag_correlation,
)


def test_quantile_normalization_aligns_groups(spark):
    # two groups with shifted but same-shape distributions (sizes 4):
    # after QN both groups carry identical value multisets
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "a", 40),
            (5, "b", 110), (6, "b", 120), (7, "b", 130), (8, "b", 140)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalization(df, "g", "v", "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["qn_value"])
    assert sorted(by_g["a"]) == sorted(by_g["b"])
    # rank order within each group is preserved
    a = {r["id"]: r["qn_value"] for r in out if r["g"] == "a"}
    assert a[1] < a[2] < a[3] < a[4]
    # every row maps into the pooled support
    pooled = sorted(x for _, _, x in rows)
    assert all(r["qn_value"] in pooled for r in out)


def test_quantile_normalization_identity_single_group(spark):
    rows = [(i, "a", i * 7) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalization(df, "g", "v", "id").collect()
    # one group: mid-rank k = ceil((2r-1)/2) = r -> identity mapping
    assert all(r["qn_value"] == r["v"] for r in out)


def test_lead_lag_detects_shift(spark):
    # view volume = click volume shifted forward by 2 days -> the
    # correlation at lag +2 is perfect
    rows = []
    eid = 0
    pattern = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    for d, c in enumerate(pattern, start=1):
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, d), 1, "click", 1.0))
    for d, c in enumerate(pattern, start=1):
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, d + 2), 1, "view", 1.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {r["lag"]: r for r in lead_lag_correlation(df).collect()}
    assert out[2]["r_milli"] == 1000
    assert out[2]["is_best"] == 1
    assert sum(r["is_best"] for r in out.values()) == 1
    assert len(out) == 15


def test_growth_accounting_conservation(spark):
    # u1 active wk0,1,2; u2 active wk0 then gone; u3 active wk0, skips
    # wk1, back wk2 (resurrected)
    def ev(eid, week, u):
        return (eid, datetime(1970, 1, 1 + week * 7, 1), u, "click", 1.0)

    rows = [
        ev(1, 0, 1), ev(2, 1, 1), ev(3, 2, 1),
        ev(4, 0, 2),
        ev(5, 0, 3), ev(6, 2, 3),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {r["week"]: r for r in growth_accounting(df).collect()}
    w0, w1, w2 = sorted(out)
    assert out[w0]["n_new"] == 3 and out[w0]["n_active"] == 3
    assert out[w1]["n_active"] == 1
    assert out[w1]["n_retained"] == 1
    assert out[w1]["n_churned"] == 2  # u2 and u3 inactive in wk1
    assert out[w2]["n_resurrected"] == 1  # u3 returns
    assert out[w2]["n_retained"] == 1  # u1
    # conservation both directions
    for w in (w0, w1, w2):
        r = out[w]
        assert (
            r["n_active"]
            == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        )
    assert out[w1]["n_churned"] + out[w1]["n_retained"] == out[w0][
        "n_active"
    ]
    # quick ratio wk2: (0 new + 1 res) / 0 churned -> null; wk1: 0/2=0
    assert out[w1]["quick_ratio_milli"] == 0
    assert out[w2]["quick_ratio_milli"] is None
