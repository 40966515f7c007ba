"""Z-order (Morton) data layout + clustering-quality stats.

At 100 TB the cheapest query is the one that never reads the file:
min/max zone maps on parquet footers prune whole files, but only if the
write layout clusters each filter column.  A linear sort clusters ONE
column; Z-ORDER interleaves the bits of several columns so every
interleaved key prefix is a small hyper-rectangle — files stay narrow on
ALL participating dimensions at once (Morton 1966; the same layout
Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``).

Everything here is integer arithmetic on BIGINT columns (normalize to a
16-bit grid with integer scaling, interleave with shifts), so the key is
bit-identical in any engine and the oracle can replay it in plain SQL.

``zorder_layout_stats`` is the evaluation half: bucket rows by the top
bits of the z-key (a stand-in for "which file would this row land in"),
then report each bucket's min/max width on every dimension as a
micro-fraction of the global range.  Narrow widths on BOTH dims = a
range predicate on EITHER dim prunes most buckets; compare against a
single-column sort where the secondary dim's width stays ~1e6 (no
pruning).  One agg for the global extent (broadcast), one projection for
the key, one agg for the stats — no joins on data paths, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bits per dimension in the interleaved key (16 → 2 dims fit a 32-bit key)
ZBITS = 16


def _grid_int(col: Column, lo: Column, hi: Column) -> Column:
    """Scale an integer column onto [0, 2^ZBITS) grid cells.

    floor((x - lo) * (2^ZBITS - 1) / max(hi - lo, 1)).  The product can
    exceed 2^53 for epoch-micro spans, but long→double conversion and
    IEEE division round identically in every engine (round-to-nearest-
    even), so the floored cell is still bit-reproducible cross-engine —
    which is the property the oracle needs; inputs and output are BIGINT.
    """
    span = F.greatest(hi - lo, F.lit(1))
    return F.floor(((col - lo) * ((1 << ZBITS) - 1)) / span).cast("long")


def zorder_key(cells: Sequence[Column]) -> Column:
    """Interleave the low ZBITS bits of each grid cell into one BIGINT.

    Bit i of dimension d lands at position i * ndims + d, so the most
    significant interleaved bits alternate across dimensions — the
    Morton property that makes key-contiguous buckets hyper-rectangles.
    """
    nd = len(cells)
    parts = []
    for d, cell in enumerate(cells):
        for i in range(ZBITS):
            parts.append(
                F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * nd + d)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def zorder_layout_stats(
    df: DataFrame,
    dim_cols: Sequence[str],
    bucket_bits: int = 8,
) -> DataFrame:
    """Per-bucket clustering stats for a Z-ordered layout of ``df``.

    ``dim_cols`` must be integer-valued (cast timestamps to epoch micros
    first).  Buckets = top ``bucket_bits`` bits of the interleaved key —
    the "file id" a Z-ordered writer would assign.  Output per bucket:
    row count plus, per dimension, min/max grid cell and the bucket's
    width as a micro-fraction of the full grid — the zone-map narrowness
    a reader's min/max pruning would exploit.
    """
    dims = list(dim_cols)
    ext = df.agg(
        *[F.min(c).cast("long").alias(f"_lo_{c}") for c in dims],
        *[F.max(c).cast("long").alias(f"_hi_{c}") for c in dims],
    )
    with_ext = df.crossJoin(F.broadcast(ext))
    cells = [
        _grid_int(
            F.col(c).cast("long"), F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        ).alias(f"_cell_{c}")
        for c in dims
    ]
    keyed = with_ext.select(*cells).select(
        *[F.col(f"_cell_{c}") for c in dims],
        zorder_key([F.col(f"_cell_{c}") for c in dims]).alias("_zkey"),
    )
    total_bits = ZBITS * len(dims)
    bucket = F.shiftright(F.col("_zkey"), total_bits - bucket_bits).alias("bucket")
    stats = keyed.groupBy(bucket).agg(
        F.count("*").cast("long").alias("n_rows"),
        *[
            x
            for c in dims
            for x in (
                F.min(f"_cell_{c}").alias(f"{c}_cell_min"),
                F.max(f"_cell_{c}").alias(f"{c}_cell_max"),
            )
        ],
    )
    width_cols = [
        F.round(
            (F.col(f"{c}_cell_max") - F.col(f"{c}_cell_min") + 1)
            / (1 << ZBITS)
            * 1e6
        )
        .cast("long")
        .alias(f"{c}_width_micro")
        for c in dims
    ]
    return stats.select(
        "bucket",
        "n_rows",
        *[F.col(f"{c}_cell_min") for c in dims],
        *[F.col(f"{c}_cell_max") for c in dims],
        *width_cols,
    )


def compaction_plan(
    files: DataFrame,
    part_col: str,
    order_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planning — the lakehouse maintenance job
    that turns a long tail of tiny files into sequential merge groups of
    ~``target_bytes`` each, preserving the table's sort order (so zone
    maps / Z-order stay intact after the rewrite, unlike a shuffle-based
    rewrite).

    Group assignment is the streaming bin-fill closed form: a file
    starts a new group when the running byte total BEFORE it crosses a
    target boundary — group = floor((cumsum − bytes) / target).  Pure
    integer windows, one shuffle keyed by partition; deterministic under
    the (order_col) total order (order_col must be unique per partition
    — it is a file identifier).  A single file larger than the target
    gets its own group (groups can exceed target by at most one file —
    documented semantics of sequential bin-fill).

    Output: (part_col, group_id, n_files, group_bytes, <order>_min,
    <order>_max).
    """
    run = (
        Window.partitionBy("_p")
        .orderBy("_o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = files.select(
        F.col(part_col).alias("_p"),
        F.col(order_col).alias("_o"),
        F.col(bytes_col).cast("long").alias("_b"),
    )
    grouped = base.select(
        "_p",
        "_o",
        "_b",
        F.floor((F.sum("_b").over(run) - F.col("_b")) / F.lit(target_bytes))
        .cast("long")
        .alias("group_id"),
    )
    return grouped.groupBy(
        F.col("_p").alias(part_col), "group_id"
    ).agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("_b").cast("long").alias("group_bytes"),
        F.min("_o").alias(f"{order_col}_min"),
        F.max("_o").alias(f"{order_col}_max"),
    )


def zone_map_effectiveness(
    df: DataFrame,
    layout_key: Column,
    tiebreak: Column,
    stat_col: Column,
    n_files: int,
    predicates: Sequence[tuple[int, int]],
    layout_name: str,
) -> DataFrame:
    """Would this write layout let min/max zone maps prune a range
    predicate?  Simulate the file split and count touched files.

    Rows are laid out in (layout_key, tiebreak) order — a TOTAL order,
    the repo's window discipline — and cut into ``n_files`` contiguous
    "files" with ``ntile`` (exactly how a sorted write splits into
    equal row-group files).  Each file keeps min/max of ``stat_col``
    (its parquet footer zone map); a predicate [lo, hi] must read a
    file iff the ranges overlap.  The per-file stat table has n_files
    rows, so evaluating every candidate predicate against it is free —
    the cost is one pass + one total-order rank.

    That rank is a global sort: this is an AUDIT tool you run on one
    partition's worth (or a sample) of data to CHOOSE a layout before
    rewriting 100 TB — the verdict (pruned fraction per layout per
    predicate family) is what transfers to the full rewrite, not the
    simulated file cuts themselves.

    Output, one row per predicate: layout, pred_id, lo, hi, n_files,
    files_scanned, rows_scanned (rows in touched files — the read
    bill), pruned_micro (fraction of files skipped).
    """
    w = Window.orderBy(layout_key.asc(), tiebreak.asc())
    ranked = df.select(
        stat_col.alias("_v"), F.ntile(n_files).over(w).alias("file_id")
    )
    zones = ranked.groupBy("file_id").agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.count("*").cast("long").alias("_rows"),
    )
    preds = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("long").alias("pred_id"),
                    F.lit(int(lo)).cast("long").alias("lo"),
                    F.lit(int(hi)).cast("long").alias("hi"),
                )
                for i, (lo, hi) in enumerate(predicates)
            ]
        )
    )
    crossed = zones.select("file_id", "_lo", "_hi", "_rows", preds.alias("p"))
    hit = (F.col("_hi") >= F.col("p.lo")) & (F.col("_lo") <= F.col("p.hi"))
    match_rows = F.when(
        hit,
        F.col("_rows"),
    ).otherwise(F.lit(0))
    agg = crossed.groupBy("p.pred_id", "p.lo", "p.hi").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(hit.cast("long")).cast("long").alias("files_scanned"),
        F.sum(match_rows).cast("long").alias("rows_scanned"),
    )
    return agg.select(
        F.lit(layout_name).alias("layout"),
        F.col("pred_id").cast("long"),
        "lo",
        "hi",
        "n_files",
        "files_scanned",
        "rows_scanned",
        F.round(
            (F.col("n_files") - F.col("files_scanned"))
            * 1_000_000
            / F.col("n_files")
        )
        .cast("long")
        .alias("pruned_micro"),
    )
