"""Prefix-filtered EXACT set-similarity join (AllPairs / PPJoin family).

The LSH families (`operators/dedup.py`, `operators/similarity.py`) trade
recall for speed; this operator is the exact counterpart: every pair with
token-set Jaccard >= t, no false negatives, with candidate generation
bounded by the *prefix filter* (Chaudhuri et al. 2006 SSJoin; Bayardo et
al. 2007 AllPairs; Xiao et al. 2008 PPJoin):

  order all tokens by a single global total order (df ASC, token ASC —
  rarest first); a pair with J(A,B) >= t must share its globally-smallest
  common token within the first |X| - ceil(t*|X|) + 1 tokens of BOTH
  sides, so it suffices to equi-join the *prefixes* instead of the full
  token sets.  Proof sketch: J >= t implies |A∩B| >= ceil(t*|A|); if the
  smallest shared token were outside A's prefix, all shared tokens would
  sit in A's last ceil(t*|A|) - 1 positions — too few.  Symmetric for B.

Scale shape (the reason this survives 100 TB where naive token joins
die): the join key space is only the PREFIX tokens, and a prefix is by
construction the rarest ~(1-t) fraction of each document's vocabulary —
high-df stopwords never become join keys, so there is no hot-key
explosion to salt away.  The size filter (t*|A| <= |B| <= |A|/t) prunes
further before the distinct.  One shuffle for df, one for the candidate
equi-join, one for the intersection count — all keyed narrowly.

Per-doc token ordering uses array_sort over (df, token) structs — no
global rank materialization, so the vocabulary never passes through a
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text_col


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Distinct (id, token) pairs of the normalized text."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(normalized_text_col(F.col(text_col)), " ")).alias("_w"),
        )
        .where(F.col("_w") != "")
        .distinct()
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    hot_df_threshold: int = 64,
    hot_salt: int = 32,
) -> DataFrame:
    """All pairs with token-set Jaccard >= threshold — exact, no sampling.

    Output: (id_a, id_b, n_a, n_b, n_common, jaccard_micro), id_a < id_b.
    The threshold compare is done on integers
    (n_common * 1e6 >= t_micro * union) so the kept set is reproducible
    bit-for-bit in any engine; jaccard_micro is the single-division
    micro-int form.
    """
    t_micro = int(round(threshold * 1_000_000))
    # Pin the token table once: it feeds FOUR branches (prefix side a,
    # prefix side b, doc-set side a, doc-set side b), and without the
    # lineage cut every branch replays the scan+normalize+explode+
    # distinct — the q61 self-join recompute class (measured ~40s ->
    # ~20s at sf0.1 from the two pins in this function alone).
    tok = _tokens(df, text_col, id_col).localCheckpoint()

    doc_freq = tok.groupBy("_w").agg(F.count("*").cast("long").alias("_df"))

    # Per-doc token list sorted by the global (df ASC, token ASC) order;
    # array_sort on the struct keeps the ordering fully distributed.
    per_doc = (
        tok.join(doc_freq, "_w")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("_w")))
            ).alias("_toks"),
            F.count("*").cast("long").alias("_n"),
        )
    )
    # prefix length = n - ceil(t*n) + 1; integer ceil via (x + d - 1) div d
    ceil_tn = F.floor((F.col("_n") * t_micro + 999_999) / 1_000_000).cast("long")
    prefix = per_doc.select(
        "_id",
        "_n",
        F.posexplode(
            F.slice(F.col("_toks"), 1, (F.col("_n") - ceil_tn + 1).cast("int"))
        ).alias("_pos", "_p"),
    ).select(
        "_id",
        "_n",
        (F.col("_pos") + 1).cast("long").alias("_i"),
        F.col("_p._w").alias("_w"),
    ).localCheckpoint()  # pinned: both self-join sides read this table

    a = prefix.select(
        F.col("_id").alias("id_a"),
        F.col("_n").alias("n_a"),
        F.col("_i").alias("_ia"),
        "_w",
    )
    b = prefix.select(
        F.col("_id").alias("id_b"),
        F.col("_n").alias("n_b"),
        F.col("_i").alias("_ib"),
        "_w",
    )
    # Candidate generation is an OUTPUT-heavy self-join: a prefix token
    # shared by k docs emits ~k²/2 pair rows, so the join's CPU is in
    # its output, not its input — and the input is tiny in BYTES, so
    # AQE's byte-based coalescing collapses the join to ONE partition
    # and the whole 78M-row production runs single-task (measured 36 s
    # of a 47 s query at sf0.1; UI stage showed numTasks=1,
    # shuffleWriteRecords=78M).  Two measured countermeasures:
    # * explicit-numPartitions repartitions on the join keys (exempt
    #   from AQE coalescing) pin real parallelism into the join stage;
    # * HOT tokens (df > hot_df_threshold; the df table is already on
    #   hand) are salted: the b side keys by (token, hash(id_b) % S)
    #   and the a side replicates each hot row S times, spreading one
    #   token's k² production across S partitions — the skewjoin.py
    #   hot/cold discipline.  Replication cost is S·|hot prefix rows|,
    #   bounded by the pair output those rows generate (k > threshold
    #   ⇒ k²/2 ≫ k·S); cold tokens never pay it.  Defaults (64, 32)
    #   keep the clean invariant k >= 2S (production >= replication for
    #   every hot token) and sit on the measured plateau: the round-5
    #   sweep at sf0.1/local[32] (BENCH/QUIET.md) found 9.2-11.9 s for
    #   (thr, salt) in {(32,32),(64,32),(64,16),(32,64)} vs 14.5-17.9 s
    #   at the old (256, 16) — the gain is real parallelism in the
    #   hot-token candidate production, not filter selectivity.
    P = df.sparkSession.sparkContext.defaultParallelism
    hot_tokens = F.broadcast(
        doc_freq.where(F.col("_df") > int(hot_df_threshold)).select("_w")
    )
    a_cold = a.join(hot_tokens, "_w", "left_anti")
    b_cold = b.join(hot_tokens, "_w", "left_anti")
    cold_cand = a_cold.repartition(P, "_w").join(
        b_cold.repartition(P, "_w"), "_w"
    )
    a_hot = a.join(hot_tokens, "_w", "left_semi").withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(int(hot_salt) - 1)).cast("array<int>")),
    )
    b_hot = b.join(hot_tokens, "_w", "left_semi").withColumn(
        "_salt", F.pmod(F.xxhash64("id_b"), F.lit(int(hot_salt))).cast("int")
    )
    hot_cand = a_hot.repartition(P, "_w", "_salt").join(
        b_hot.repartition(P, "_w", "_salt"), ["_w", "_salt"]
    )
    # Minimum overlap for J >= t at sizes (n_a, n_b):
    # α = ceil(t(n_a+n_b)/(1+t)), integer form.
    alpha = F.expr(
        f"({t_micro} * (n_a + n_b) + {1_000_000 + t_micro - 1})"
        f" div {1_000_000 + t_micro}"
    )
    # Per-ROW positional prefilter (sound BEFORE the pair dedup): within
    # one doc, prefix position is monotone in the global (df, token)
    # order, so the smallest shared token w* attains min(_ia) AND
    # min(_ib) simultaneously — every other candidate row of the same
    # pair has BOTH positions >= w*'s, hence a bound <= the pair bound.
    # Dropping rows whose own bound misses α can therefore never drop
    # w* of a surviving pair (w*'s bound IS the pair bound), and if the
    # pair bound misses α every row's does — the pair dies correctly.
    # This prunes the 78M-row join output stream BEFORE it pays the
    # dedup shuffle, where the post-agg filter alone pruned after.
    cand = (
        cold_cand.select("id_a", "id_b", "n_a", "n_b", "_ia", "_ib")
        .unionByName(hot_cand.select("id_a", "id_b", "n_a", "n_b", "_ia", "_ib"))
        .where(F.col("id_a") < F.col("id_b"))
        # size filter: t*n_a <= n_b and t*n_b <= n_a (integer compare)
        .where(F.col("n_b") * 1_000_000 >= F.col("n_a") * t_micro)
        .where(F.col("n_a") * 1_000_000 >= F.col("n_b") * t_micro)
        .where(
            F.least(F.col("n_a") - F.col("_ia"), F.col("n_b") - F.col("_ib"))
            + 1
            >= alpha
        )
    )
    # Two measured fixes at sf0.1 (78M raw candidates on this
    # template-heavy corpus):
    # 1. Force real parallelism into the verify stage.  Candidate rows
    #    are four narrow ints, so AQE's byte-based coalescing collapses
    #    the post-join shuffle to ONE partition — but each row's verify
    #    cost is an array_intersect over full token sets, and CPU is
    #    what matters: 1037s single-task vs ~74s spread.  An explicit
    #    numPartitions repartition is exempt from AQE coalescing;
    #    defaultParallelism tracks the cluster, not a magic constant.
    # 2. Dedup BEFORE verify: pairs share ~8 prefix tokens here (78M →
    #    9.8M), and the dedup reuses the repartition's (id_a, id_b)
    #    clustering, so it adds no exchange while cutting the
    #    array_intersect work 8x.  (The old carry-dupes-to-the-end note
    #    predates measuring a corpus where candidates outnumber results
    #    10:1 — with a cheap verify both orders tie, with 78M rows this
    #    order wins.)
    # 3. PPJoin POSITIONAL filter (Xiao et al. 2008), folded into the
    #    same per-pair agg that does the dedup (grouping keys extend the
    #    repartition keys, so still no extra exchange): the prefix match
    #    with minimal A-position is the globally smallest shared token
    #    w* — any shared token with smaller global order would itself be
    #    a prefix match on both sides (its positions are below i*, j*,
    #    hence inside both prefixes), contradicting minimality.  Every
    #    shared token therefore sits at positions >= (i*, j*) in BOTH
    #    docs, so |A∩B| <= 1 + min(n_a - i*, n_b - j*); pairs whose
    #    bound misses the minimum overlap α = ceil(t(a+b)/(1+t)) can
    #    never pass the final Jaccard test and skip the verify join.
    #    min(_ia) and min(_ib) minimize at the SAME token w*, so the
    #    two independent MIN aggregates recover (i*, j*) exactly.
    cand = (
        cand.repartition(
            df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.min("_ia").alias("_ia"), F.min("_ib").alias("_ib"))
    )
    cand = cand.where(
        F.least(F.col("n_a") - F.col("_ia"), F.col("n_b") - F.col("_ib")) + 1
        >= alpha
    ).select("id_a", "id_b", "n_a", "n_b")

    # Verification: n_common via array_intersect against the per-doc token
    # SET table (|docs| rows of short arrays) joined in by id — NOT the
    # exploded token join (cand × n_a rows through a shuffle + agg), which
    # degenerates when the corpus is template-heavy and the prefix filter
    # passes ~all pairs (measured 145s → this form; AQE broadcasts the set
    # table at test scale, and at cluster scale two keyed shuffles of the
    # candidate rows still beat the token-explode by ~avg_doc_len×).
    doc_sets = tok.groupBy("_id").agg(
        F.array_sort(F.collect_list("_w")).alias("_set")
    )
    sa = doc_sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("_sa"))
    sb = doc_sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("_sb"))
    inter = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("n_common"),
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return (
        inter.where(F.col("n_common") * 1_000_000 >= F.lit(t_micro) * union)
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(F.col("n_common") / union * 1e6).cast("long")
            .alias("jaccard_micro"),
        )
    )


def source_token_containment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Directional vocabulary overlap between every pair of sources.

    qa21's leakage monitor flags EXACT duplicate docs across sources;
    this is the coarser mixture-design view: how much of source A's
    token VOCABULARY is inside B's (containment |V_A ∩ V_B| / |V_A|) —
    the signal for "these two feeds are the same upstream corpus" and
    for weighting overlapping sources in a training mix.

    Scale shape: everything happens on the distinct (source, token)
    inverted index, which is |vocab|·|sources| at worst — tiny next to
    the corpus.  The token self-join emits at most n_sources² rows per
    token (sources is a small dimension by definition), so there is no
    hot-key risk regardless of corpus size.  Output is one row per
    UNORDERED source pair with both directions' containment micro-ints
    plus vocab Jaccard.
    """
    tok = (
        df.select(
            F.col(source_col).alias("_src"),
            F.explode(
                F.split(normalized_text_col(F.col(text_col)), " ")
            ).alias("_w"),
        )
        .where(F.col("_w") != "")
        .distinct()
    )
    sizes = tok.groupBy("_src").agg(F.count("*").cast("long").alias("_n"))
    a = tok.select(F.col("_src").alias("src_a"), "_w")
    b = tok.select(F.col("_src").alias("src_b"), "_w")
    common = (
        a.join(b, "_w")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("_src").alias("src_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_src").alias("src_b"), F.col("_n").alias("n_b"))
    joined = common.join(F.broadcast(sa), "src_a").join(F.broadcast(sb), "src_b")
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return joined.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "n_common",
        F.round(F.col("n_common") / F.col("n_a") * 1e6)
        .cast("long")
        .alias("cont_a_micro"),
        F.round(F.col("n_common") / F.col("n_b") * 1e6)
        .cast("long")
        .alias("cont_b_micro"),
        F.round(F.col("n_common") / union * 1e6)
        .cast("long")
        .alias("jaccard_micro"),
    )
