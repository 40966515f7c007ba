"""Wave-44 operators: lexical concentration, MATTR, RMST."""

from __future__ import annotations

from ontology_mapper_spark.operators.stats import rmst
from ontology_mapper_spark.operators.textstats import (
    lexical_concentration,
    mattr,
)


def test_lexical_concentration_hand(spark):
    # "x x y z": N=4, V=3, c = [2,1,1]: sum_c2=6, sd=2
    # K = 1e4*(6-4)/16 = 1250 -> 1_250_000_000 micro
    # D = 2/(4*3) = 1/6 -> 166667 micro
    df = spark.createDataFrame(
        [("a", "x x y z")], "source string, text string"
    )
    r = lexical_concentration(df, "source", "text").collect()[0]
    assert (r["n_tokens"], r["v_types"], r["sum_c2"]) == (4, 3, 6)
    assert r["yule_k_micro"] == 1_250_000_000
    assert r["simpson_d_micro"] == 166_667


def test_lexical_concentration_all_same_word(spark):
    # "w w w w": K = 1e4*(16-4)/16 = 7500; D = 12/12 = 1
    df = spark.createDataFrame(
        [("a", "w w w w")], "source string, text string"
    )
    r = lexical_concentration(df, "source", "text").collect()[0]
    assert r["yule_k_micro"] == 7_500_000_000
    assert r["simpson_d_micro"] == 1_000_000


def test_mattr_short_doc_ttr_fallback(spark):
    df = spark.createDataFrame(
        [(1, "a b a")], "doc_id long, text string"
    )
    r = mattr(df, "doc_id", "text", 25).collect()[0]
    assert r["n_windows"] == 0
    assert r["mattr_micro"] == 666_667  # 2/3


def test_mattr_window_exact_small(spark):
    # w=2 on "a b a b": windows (a,b),(b,a),(a,b) all 2 distinct -> 1.0
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    r = mattr(df, "doc_id", "text", 2).collect()[0]
    assert r["n_windows"] == 3 and r["mattr_micro"] == 1_000_000
    # "a a a b": windows (a,a)=1,(a,a)=1,(a,b)=2 -> 4/6
    df2 = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    r2 = mattr(df2, "doc_id", "text", 2).collect()[0]
    assert r2["mattr_micro"] == 666_667


def test_mattr_repeated_vs_diverse_orders(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(60))),
            (2, " ".join("w0" for _ in range(60))),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in mattr(df, "doc_id", "text", 25).collect()}
    assert out[1]["mattr_micro"] == 1_000_000
    # constant doc: each 25-window has 1 distinct -> 1/25
    assert out[2]["mattr_micro"] == 40_000


def test_rmst_no_censoring_hand(spark):
    # durations 10, 20 (both events), tau=30:
    # S = 1 on [0,10), 0.5 on [10,20), 0 after
    # RMST = 1*10 + 0.5*10 + 0*10 = 15 -> 15e6 micro-units
    df = spark.createDataFrame(
        [(10, True), (20, True)], "t long, e boolean"
    )
    r = rmst(df, "t", "e", 30).collect()[0]
    assert r["n_event_times"] == 2
    assert r["rmst_us_micro"] == 15_000_000
    assert r["rmst_frac_micro"] == 500_000


def test_rmst_all_censored_is_full_horizon(spark):
    df = spark.createDataFrame(
        [(10, False), (20, False)], "t long, e boolean"
    )
    r = rmst(df, "t", "e", 30).collect()[0]
    assert r["n_event_times"] == 0
    assert r["rmst_us_micro"] == 30_000_000
    assert r["rmst_frac_micro"] == 1_000_000
