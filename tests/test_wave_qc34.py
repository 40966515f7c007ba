"""Wave-52 operators: shift-share decomposition, quintile migration."""

from __future__ import annotations

from ontology_mapper_spark.operators.temporal import (
    quintile_migration,
    shift_share,
)


def test_shift_share_pure_rate_change(spark):
    # same mix both periods, segment b's rate doubles
    rows = [("a", False, 10)] * 5 + [("b", False, 20)] * 5
    rows += [("a", True, 10)] * 5 + [("b", True, 40)] * 5
    df = spark.createDataFrame(rows, "s string, p boolean, v long")
    out = {r["s"]: r for r in shift_share(df, "s", "p", "v").collect()}
    g = out["a"]
    assert g["mix_total_milli"] == 0
    assert g["inter_total_milli"] == 0
    # delta = (10+40)/2 - (10+20)/2 = 10 -> 10000 milli
    assert g["delta_actual_milli"] == 10_000
    assert g["rate_total_milli"] == 10_000
    assert out["b"]["rate_milli"] == 10_000  # w1=0.5 x (40-20)
    assert out["b"]["r1_milli"] == 20_000 and out["b"]["r2_milli"] == 40_000


def test_shift_share_pure_mix_change(spark):
    # rates fixed (a=10, b=30); mix moves 50/50 -> 20/80
    rows = [("a", False, 10)] * 5 + [("b", False, 30)] * 5
    rows += [("a", True, 10)] * 2 + [("b", True, 30)] * 8
    df = spark.createDataFrame(rows, "s string, p boolean, v long")
    g = shift_share(df, "s", "p", "v").collect()[0]
    assert g["rate_total_milli"] == 0 and g["inter_total_milli"] == 0
    # delta = (2*10+8*30)/10 - 20 = 26 - 20 = 6
    assert g["delta_actual_milli"] == 6_000
    assert g["mix_total_milli"] == 6_000


def test_shift_share_reconciles(spark):
    rows = [("a", False, 7)] * 3 + [("b", False, 19)] * 7
    rows += [("a", True, 11)] * 6 + [("b", True, 23)] * 4
    df = spark.createDataFrame(rows, "s string, p boolean, v long")
    g = shift_share(df, "s", "p", "v").collect()[0]
    total = g["mix_total_milli"] + g["rate_total_milli"] + g["inter_total_milli"]
    assert abs(total - g["delta_actual_milli"]) <= 2  # micro rounding only


def test_quintile_migration_identity(spark):
    # identical spend both periods: everyone stays, trace = 1
    rows = []
    for u in range(10):
        rows += [(u, False, (u + 1) * 10), (u, True, (u + 1) * 10)]
    df = spark.createDataFrame(rows, "u long, p boolean, v long")
    out = quintile_migration(df, "u", "p", "v", 5).collect()
    assert out[0]["stay_share_micro"] == 1_000_000
    assert all(r["tile_from"] == r["tile_to"] for r in out)
    assert out[0]["n_users"] == 10


def test_quintile_migration_full_reversal(spark):
    # period-2 spends reversed: top quintile swaps with bottom
    rows = []
    for u in range(10):
        rows += [(u, False, (u + 1) * 10), (u, True, (10 - u) * 10)]
    df = spark.createDataFrame(rows, "u long, p boolean, v long")
    out = {(r["tile_from"], r["tile_to"]): r["n"]
           for r in quintile_migration(df, "u", "p", "v", 5).collect()}
    assert out[(1, 5)] == 2 and out[(5, 1)] == 2
    assert (1, 1) not in out


def test_quintile_migration_one_period_users_dropped(spark):
    rows = [(1, False, 10), (1, True, 10), (2, False, 99)]  # u2 churned
    df = spark.createDataFrame(rows, "u long, p boolean, v long")
    out = quintile_migration(df, "u", "p", "v", 5).collect()
    assert out[0]["n_users"] == 1
