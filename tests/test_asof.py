"""As-of join vs a brute-force Python oracle."""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from ontology_mapper_spark.operators.asof import asof_join


def test_asof_join_matches_bruteforce(spark):
    rng = random.Random(21)
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    left = [
        (f"k{rng.randrange(5)}", i, t0 + timedelta(minutes=rng.randrange(500)))
        for i in range(200)
    ]
    right_map = {}
    for _ in range(60):
        k = f"k{rng.randrange(6)}"  # k5 exists only on the right
        ts = t0 + timedelta(minutes=rng.randrange(500))
        right_map[(k, ts)] = rng.randrange(1000)  # unique (key, ts)
    right = [(k, ts, v) for (k, ts), v in right_map.items()]

    ldf = spark.createDataFrame(left, ["k", "event_id", "ts"])
    rdf = spark.createDataFrame(right, ["k", "rts", "val"])
    got = {
        (r.k, r.event_id): (r.asof_val, r.asof_ts)
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts").collect()
    }

    for k, eid, ts in left:
        cands = [(rts, v) for (rk, rts), v in right_map.items()
                 if rk == k and rts <= ts]
        expect = max(cands)[1] if cands else None
        # collected timestamps come back tz-naive (session TZ UTC)
        expect_ts = max(cands)[0].replace(tzinfo=None) if cands else None
        assert got[(k, eid)] == (expect, expect_ts), (k, eid)
    assert len(got) == len(left)  # every left row survives (left semantics)


def test_asof_join_tied_right_rows_deterministic(spark):
    """ADVICE regression: several right rows sharing (key, ts) must resolve
    identically under any parallelism — the value-column tiebreak picks the
    max-by-value row."""
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    ldf = spark.createDataFrame([("k0", 1, t0 + timedelta(minutes=10))],
                                ["k", "event_id", "ts"])
    tied = [("k0", t0, v) for v in (7, 3, 9, 1)]
    for parts in (1, 4, 8):
        rdf = spark.createDataFrame(tied, ["k", "rts", "val"]).repartition(parts)
        rows = asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts").collect()
        assert rows[0].asof_val == 9, parts


def test_catalog_write_table_manifest(spark, tmp_path):
    from ontology_mapper_spark.catalog import read_manifest, write_table

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "a", "z")], ["id", "part", "val"]
    )
    path = str(tmp_path / "tbl")
    m = write_table(df, path, partition_by=["part"], snapshot_id="snap1")
    assert m["row_count"] == 3 and m["partition_spec"] == ["part"]
    m2 = read_manifest(path)
    assert m2["snapshot_id"] == "snap1"
    back = spark.read.parquet(path)
    assert back.count() == 3 and set(back.columns) == {"id", "part", "val"}
