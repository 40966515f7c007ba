"""SSSP vs a driver-side Dijkstra; EWMA recursion semantics."""

import heapq

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.operators.graph import sssp
from ontology_mapper_spark.operators.temporal import ewma_bursts


def test_sssp_matches_dijkstra(spark):
    e1 = [(i, i + 1, i % 7 + 1) for i in range(40)]
    e2 = [(i, i + 10, i % 5 + 3) for i in range(31)]
    edges = spark.createDataFrame(e1 + e2, "src long, dst long, w long")
    got = {r["node"]: r["dist"] for r in sssp(edges, 0, max_rounds=16).collect()}

    adj = {}
    for s, d, w in e1 + e2:
        adj.setdefault(s, []).append((d, w))
    dist = {0: 0}
    h = [(0, 0)]
    while h:
        du, u = heapq.heappop(h)
        if du > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            if du + w < dist.get(v, 1 << 60):
                dist[v] = du + w
                heapq.heappush(h, (du + w, v))
    assert got == dist


def test_sssp_unreachable_absent(spark):
    edges = spark.createDataFrame(
        [(0, 1, 5), (2, 3, 1)], "src long, dst long, w long"
    )
    got = {r["node"]: r["dist"] for r in sssp(edges, 0, max_rounds=4).collect()}
    assert got == {0: 0, 1: 5}  # 2,3 unreachable -> absent


def test_ewma_recursion_exact(spark):
    import datetime

    rows = []
    counts = [4, 4, 4, 20, 4]  # spike on day 4
    for d, n in enumerate(counts):
        for j in range(n):
            rows.append(
                ("a", datetime.datetime(2024, 1, 1 + d, 8, 0, j))
            )
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["day"]: r for r in ewma_bursts(df, "event_type", "ts").collect()}

    # python mirror: e1 = x*64; e_t = (2*64*x + 6*e)//8
    e = counts[0] * 64
    expect = {("2024-01-01"): (e, False)}
    for d in range(1, len(counts)):
        burst = counts[d] * 64 > 2 * e
        e = (2 * 64 * counts[d] + 6 * e) // 8
        expect[f"2024-01-0{d + 1}"] = (e, burst)
    for day, (ev, burst) in expect.items():
        assert out[day]["ewma_s"] == ev, day
        assert out[day]["is_burst"] == burst, day
    assert out["2024-01-04"]["is_burst"] is True
    assert sum(1 for r in out.values() if r["is_burst"]) == 1


def test_ewma_requires_power_of_two_denominator(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")], "event_type string, ts string"
    ).select("event_type", F.col("ts").cast("timestamp"))
    with pytest.raises(AssertionError):
        ewma_bursts(df, alpha_den=6)
