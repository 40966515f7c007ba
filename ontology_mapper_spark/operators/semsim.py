"""Information-content semantic similarity (Resnik / Lin) over an
ontology DAG.

The reference resolves each mention to one ontology class
(core/lookup.py) but has no term-to-term similarity; any KG built from
its mappings immediately needs one — "how related are HP:0001250 and
HP:0002060" — and the standard corpus-free answer is Resnik (1995):
sim(a,b) = IC(lca(a,b)) with IC(t) = -ln(|descendants(t)|/N), plus
Lin (1998) 2*IC(lca)/(IC(a)+IC(b)) normalization.

Spark-first shape, built entirely on the transitive-closure table
(operators/graph.py:transitive_closure — ceil(log2(D)) doubling
rounds), which a KG at scale materializes ONCE and reuses:

  * descendant counts = one groupBy over the closure;
  * IC = micro-fixed-point ``round(-ln(sz/N)*1e6)`` computed once per
    term (single division + single ln, the q66 discipline — no double
    accumulation anywhere);
  * common ancestors of the query pairs = two equi-joins against the
    closure (each pair fans out by ~depth, not by N);
  * the LCA = max-root-depth common ancestor via a window rank with a
    TOTAL order (root_depth desc, ancestor id asc).

Everything stays bigint except the one ln per distinct term and the one
Lin division per pair, both rounded to micros — hash-exact vs a DuckDB
WITH RECURSIVE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .graph import transitive_closure

MICRO = 1_000_000


def ancestors_with_self(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node, anc, depth) closure rows plus (n, n, 0) self rows."""
    cl = transitive_closure(edges, "child", "parent").select(
        "node", F.col("ancestor").alias("anc"), "depth"
    )
    self_rows = nodes.select(
        F.col("n").alias("node"), F.col("n").alias("anc"), F.lit(0).cast("long").alias("depth")
    )
    return cl.unionByName(self_rows)


def ic_table(anc: DataFrame, n_total: int) -> DataFrame:
    """(n, ic_micro): information content per term from inclusive
    descendant counts. One ln per term; micro-rounded immediately."""
    return (
        anc.groupBy(F.col("anc").alias("n"))
        .agg(F.count("*").alias("sz"))
        .select(
            "n",
            F.round(
                -F.log(F.col("sz").cast("double") / F.lit(float(n_total))) * MICRO
            )
            .cast("long")
            .alias("ic_micro"),
        )
    )


def resnik_lin(
    edges: DataFrame,
    pairs: DataFrame,
    nodes: DataFrame,
    root: int = 0,
) -> DataFrame:
    """Resnik + Lin similarity for each (a, b) pair.

    edges: (child, parent) DAG rows; pairs: (a, b); nodes: (n,).
    Returns (a, b, lca, lca_depth, resnik_micro, lin_micro).
    """
    n_total = nodes.count()
    anc = ancestors_with_self(edges, nodes)
    ic = ic_table(anc, n_total)
    root_depth = anc.where(F.col("anc") == root).select(
        "node", F.col("depth").alias("rd")
    )

    ca = anc.select(F.col("node").alias("a"), F.col("anc").alias("c"))
    cb = anc.select(F.col("node").alias("b"), F.col("anc").alias("c"))
    common = pairs.join(ca, "a").join(cb, ["b", "c"])

    w = Window.partitionBy("a", "b").orderBy(F.col("rd").desc(), F.col("c").asc())
    best = (
        common.join(root_depth, common["c"] == root_depth["node"])
        .select("a", "b", "c", "rd")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )

    ic_l = ic.select(F.col("n").alias("c"), F.col("ic_micro").alias("ic_lca"))
    ic_a = ic.select(F.col("n").alias("a"), F.col("ic_micro").alias("ic_a"))
    ic_b = ic.select(F.col("n").alias("b"), F.col("ic_micro").alias("ic_b"))
    return (
        best.join(ic_l, "c")
        .join(ic_a, "a")
        .join(ic_b, "b")
        .select(
            "a",
            "b",
            F.col("c").alias("lca"),
            F.col("rd").cast("long").alias("lca_depth"),
            F.col("ic_lca").alias("resnik_micro"),
            F.round(
                (F.lit(2.0) * MICRO * F.col("ic_lca"))
                / (F.col("ic_a") + F.col("ic_b"))
            )
            .cast("long")
            .alias("lin_micro"),
        )
    )
