"""SCD2 gaps-and-islands: hand cases, null-safe states, one exchange."""

from __future__ import annotations

from ontology_mapper_spark.operators.scd import scd2_from_snapshots


def test_scd2_hand_computed(spark):
    rows = [
        # e1: A A B B B A  -> islands [0,2) [2,5) [5,-)
        (1, 0, "A"), (1, 1, "A"), (1, 2, "B"), (1, 3, "B"), (1, 4, "B"), (1, 5, "A"),
        # e2: constant -> single current island
        (2, 0, "X"), (2, 1, "X"),
    ]
    df = spark.createDataFrame(rows, "k long, snap long, state string")
    out = scd2_from_snapshots(df, "k", "snap", ("state",)).collect()
    e1 = sorted([r for r in out if r["k"] == 1], key=lambda r: r["valid_from"])
    assert [(r["state"], r["valid_from"], r["valid_to"], r["n_snaps"], r["is_current"])
            for r in e1] == [
        ("A", 0, 2, 2, False),
        ("B", 2, 5, 3, False),
        ("A", 5, None, 1, True),
    ]
    e2 = [r for r in out if r["k"] == 2]
    assert len(e2) == 1 and e2[0]["is_current"] and e2[0]["n_snaps"] == 2


def test_scd2_null_states_are_null_safe(spark):
    # null -> null must NOT start a new island; null -> value must
    rows = [(1, 0, None), (1, 1, None), (1, 2, "A"), (1, 3, None)]
    df = spark.createDataFrame(rows, "k long, snap long, state string")
    out = sorted(
        scd2_from_snapshots(df, "k", "snap", ("state",)).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["state"], r["valid_from"], r["n_snaps"]) for r in out] == [
        (None, 0, 2), ("A", 2, 1), (None, 3, 1),
    ]


def test_scd2_single_exchange(spark):
    rows = [(i % 3, i // 3, str(i % 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, snap long, state string")
    plan = (
        scd2_from_snapshots(df, "k", "snap", ("state",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
