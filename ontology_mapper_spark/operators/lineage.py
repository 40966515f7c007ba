"""Parquet-based lineage cutting for iterative operators.

Iterative graph algorithms (connected components, SSSP, closure) embed
each round's plan inside the next — often TWICE (join + union /
dist + frontier) — so the optimizer tree grows exponentially in rounds
and the DRIVER OOMs long before the data does.  The cure is a true
lineage cut every round.

Spark's own checkpoint()/localCheckpoint() would be the natural tool,
but Spark 4.1 dies with `NoSuchElementException: key not found: <attr>`
when re-checkpointing plans that reference earlier checkpoint
generations across loop iterations (reproduced in
pipeline/canonicalize.py, where this pattern originated).  A parquet
write + read-back is semantically the same reliable checkpoint —
materialized, lineage gone — and a fresh scan mints brand-new attribute
ids every round, so nothing can go stale.  On a cluster, set the Spark
checkpoint dir to DFS and the same code path survives executor loss.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def parquet_cutter(
    spark: SparkSession, prefix: str = "omx-cut-"
) -> Callable[[DataFrame], DataFrame]:
    """Returns cut(df) -> df': writes df to a fresh parquet dir under
    the session checkpoint dir (or a mkdtemp) and reads it back.

    Local-mode default prefers tmpfs (/dev/shm) — the cut files are
    small but latency-critical per round, and measured variance tracked
    disk state (VERDICT r4 item 3); OMX_CC_CUT_DIR overrides for A/B,
    and a configured checkpoint dir (DFS on a cluster) always wins."""
    _base = os.environ.get("OMX_CC_CUT_DIR") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    base = spark.sparkContext.getCheckpointDir() or tempfile.mkdtemp(
        prefix=prefix, dir=_base
    )
    seq = [0]

    def cut(df: DataFrame) -> DataFrame:
        path = os.path.join(base, f"{prefix}{seq[0]}")
        seq[0] += 1
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    return cut
