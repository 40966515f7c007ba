"""Wave-59 tests: Harrell C-index vs brute-force pair counting, and the
tau-b² = D_yx·D_xy concordance-family identity."""

from __future__ import annotations

import numpy as np

from ontology_mapper_spark.operators.evaluate import concordance_index
from ontology_mapper_spark.operators.stats import (
    kendall_tau_b,
    ordinal_association,
)


def _subjects(seed: int, n: int):
    rng = np.random.default_rng(seed)
    t = rng.integers(1, 60, n)
    e = rng.integers(0, 2, n)
    s = np.minimum((t // 7 + rng.integers(-2, 3, n)).clip(0), 39)
    return t, e, s


def _brute_c(t, e, s):
    conc = tied = comp = 0
    n = len(t)
    for i in range(n):
        if not e[i]:
            continue
        for j in range(n):
            if j == i:
                continue
            if t[j] > t[i] or (t[j] == t[i] and not e[j]):
                comp += 1
                if s[j] > s[i]:
                    conc += 1
                elif s[j] == s[i]:
                    tied += 1
    return comp, conc, tied


def test_c_index_matches_brute_force(spark):
    for seed in (3, 11):
        t, e, s = _subjects(seed, 300)
        df = spark.createDataFrame(
            [(int(a), int(b), int(c)) for a, b, c in zip(t, e, s)],
            "t long, e long, s long",
        )
        row = concordance_index(df, "t", "e", "s").collect()[0]
        comp, conc, tied = _brute_c(t, e, s)
        assert row["comparable"] == comp
        assert row["concordant"] == conc
        assert row["tied_score"] == tied
        assert row["c_index_micro"] == round((2 * conc + tied) * 1e6 / (2 * comp))


def test_c_index_perfect_score_is_one(spark):
    # score == time, no censoring → every comparable pair concordant
    rows = [(i + 1, 1, i + 1) for i in range(38)]
    df = spark.createDataFrame(rows, "t long, e long, s long")
    row = concordance_index(df, "t", "e", "s").collect()[0]
    assert row["c_index_micro"] == 1_000_000
    assert row["tied_score"] == 0


def test_somers_tau_identity(spark):
    # tau_b² == D_yx · D_xy (both share the numerator C−D)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 8, 500)
    y = np.minimum(x + rng.integers(0, 5, 500), 19)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x long, y long"
    )
    oa = ordinal_association(df, "x", "y").collect()[0]
    tb = kendall_tau_b(df, "x", "y").collect()[0]
    tau = tb["tau_b_milli"] / 1000.0
    dyx = oa["somers_d_yx_milli"] / 1000.0
    dxy = oa["somers_d_xy_milli"] / 1000.0
    assert abs(tau * tau - dyx * dxy) < 5e-3
    # gamma dominates tau-b in magnitude (smaller denominator)
    assert abs(oa["gamma_milli"]) >= abs(tb["tau_b_milli"]) - 1
