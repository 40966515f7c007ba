"""Wave-48 operators: Page trend + Kendall W, Hosmer-Lemeshow, Cohen's d."""

from __future__ import annotations

from ontology_mapper_spark.operators.evaluate import hosmer_lemeshow
from ontology_mapper_spark.operators.stats import cohens_d, page_trend


def test_page_perfect_agreement(spark):
    # 3 blocks, all rank t1<t2<t3: W=1, L maximal, z>0
    rows = []
    for b in range(3):
        rows += [(b, "t1", 1), (b, "t2", 2), (b, "t3", 3)]
    df = spark.createDataFrame(rows, "b long, t string, v long")
    r = page_trend(df, "b", "t", "v", ("t1", "t2", "t3")).collect()[0]
    assert r["n_blocks"] == 3 and r["k_treatments"] == 3
    assert r["w_micro"] == 1_000_000
    # L = sum j*R_j = 1*3 + 2*6 + 3*9 = 42 -> l2 = 84
    assert r["l2"] == 84
    # z = (12*42 - 3*3*3*16)/sqrt(3*9*4*8) = 72/sqrt(864) = 2.449
    assert abs(r["z_milli"] - 2449) <= 1


def test_page_reversed_order_negative(spark):
    rows = []
    for b in range(3):
        rows += [(b, "t1", 3), (b, "t2", 2), (b, "t3", 1)]
    df = spark.createDataFrame(rows, "b long, t string, v long")
    r = page_trend(df, "b", "t", "v", ("t1", "t2", "t3")).collect()[0]
    assert r["w_micro"] == 1_000_000  # blocks still agree perfectly
    assert r["z_milli"] < -2000       # but against the specified order


def test_page_disagreeing_blocks_low_w(spark):
    rows = [
        (0, "t1", 1), (0, "t2", 2), (0, "t3", 3),
        (1, "t1", 3), (1, "t2", 2), (1, "t3", 1),
    ]
    df = spark.createDataFrame(rows, "b long, t string, v long")
    r = page_trend(df, "b", "t", "v", ("t1", "t2", "t3")).collect()[0]
    assert r["w_micro"] == 0 and r["z_milli"] == 0


def test_hosmer_perfectly_calibrated(spark):
    rows = []
    for b in range(10):
        npos = round((2 * b + 1) / 20 * 20)
        rows += [(b * 10 + 5, i < npos) for i in range(20)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    out = hosmer_lemeshow(df, "s", "y", n_bins=10).collect()
    g = out[0]
    assert g["df_hl"] == 8
    assert g["hl_milli"] <= 600  # near zero (rounding of npos only)
    by = {r["bin"]: r for r in out}
    assert by[0]["expected_pos"] == 1  # 20 * 0.05


def test_hosmer_miscalibrated_blows_up(spark):
    # all positives in the LOWEST-confidence bin
    rows = [(0, True)] * 20 + [(99, False)] * 20
    df = spark.createDataFrame(rows, "s long, y boolean")
    g = hosmer_lemeshow(df, "s", "y", n_bins=10).collect()[0]
    assert g["hl_milli"] > 300_000  # wildly significant vs chi2(0.95, df)


def test_cohens_d_hand(spark):
    # a = [0,2] (m=1, s2=2), b = [4,6] (m=5, s2=2): sp=sqrt(2), d=-2.828
    df = spark.createDataFrame(
        [("a", 0), ("a", 2), ("b", 4), ("b", 6)], "g string, v long"
    )
    by = {r["g"]: r for r in cohens_d(df, "g", "v").collect()}
    assert by["a"]["mean_a_milli"] == 1000
    assert by["a"]["mean_b_milli"] == 5000
    assert abs(by["a"]["d_milli"] + 2828) <= 1
    # Hedges J = 1 - 3/(4*4-9) = 4/7
    assert abs(by["a"]["g_milli"] + round(2828.43 * 4 / 7)) <= 1
    assert by["b"]["d_milli"] == -by["a"]["d_milli"]


def test_cohens_d_zero_variance_null(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, v long"
    )
    by = {r["g"]: r for r in cohens_d(df, "g", "v").collect()}
    assert by["a"]["d_milli"] is None and by["a"]["g_milli"] is None
