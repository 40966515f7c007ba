"""Corpus-trained document classifiers / data-selection weights.

Two classic LLM-curation models, both trained INSIDE the corpus scan and
expressed as pure integer arithmetic so any engine reproduces them
bit-for-bit (the contract.py micro-fixed-point rules):

* `nb_label_scores` — a Multinomial Naive Bayes classifier over word
  counts (the fastText/CCNet-style quality-or-source classifier used to
  filter web corpora, e.g. GPT-3's WebText-vs-CommonCrawl filter). The
  reference scores candidate mappings with a hand-tuned lexical
  comparator (services/comparator.py:16-43); this is the corpus-trained
  generalization a 100 TB pipeline actually runs.
* `dsir_weights` — hashed-n-gram importance weights (Data Selection via
  Importance Resampling, Xie et al. 2023): per-doc log-likelihood ratio
  between a target-domain unigram distribution and the raw-corpus
  distribution, over a fixed number of hash buckets so the model size is
  O(buckets), not O(vocab).

Scale contract (both):
* Training statistics are groupBy counts (map-side combined); the model
  table is vocabulary- or bucket-sized and broadcast back against the
  token stream — the per-doc pass is ONE shuffle keyed by doc.
* Every log is taken ONCE per distinct model row (never per token) and
  stored as `round(ln(ratio)*1e6)` micro-nats; per-doc scores are plain
  integer sums of (token count x micro log-prob) — no double
  accumulation anywhere.
* Laplace (+1) smoothing keeps every ratio strictly positive and makes
  the dense word x class grid well-defined where a class never saw a
  word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import words_col

MICRO = 1_000_000


def _ln_ratio_micro(num, den):
    """round(ln(num/den)*1e6) as bigint — ONE division then one ln,
    deterministic IEEE on any engine."""
    return F.round(F.log(num.cast("double") / den.cast("double")) * MICRO).cast(
        "long"
    )


def nb_label_scores(
    df: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train add-one-smoothed Multinomial NB on (label <- words) over the
    whole corpus, then score every document against every class and emit
    the argmax.

    Output: (id, <label_col>, pred_<label_col>, score_micro, correct) —
    score_micro = ln P(class) + sum_w n_w * ln P(w|class), in integer
    micro-nats; correct = 1 when the argmax recovers the true label
    (self-classification accuracy is the standard separability monitor
    for a source mix). Docs with zero tokens have no score rows and are
    absent (documented, mirrors oov_stats).

    Scale: word x class counts and totals are one groupBy each; the
    dense vocab x class model grid (V*C rows, C small) is broadcast into
    the token join, so the scoring pass is one shuffle keyed by doc and
    the argmax is a per-doc window with a (score desc, label) total
    order.
    """
    # ONE explode + ONE (doc, word) shuffle feeds both the training
    # counts and the scoring pass: label is functional of doc_id, so the
    # per-(doc, label, word) counts roll up to the word x class model
    # without re-reading the corpus.
    dwc = (
        df.select(
            F.col(id_col), F.col(label_col).alias("_lbl"),
            F.explode(words_col(F.col(text_col))).alias("w"),
        )
        .groupBy(id_col, "_lbl", "w")
        .agg(F.count("*").cast("long").alias("_nw"))
        .localCheckpoint()
    )
    wc = dwc.groupBy("_lbl", "w").agg(F.sum("_nw").alias("_c"))
    cls = (
        df.groupBy(F.col(label_col).alias("_lbl"))
        .agg(F.count("*").cast("long").alias("_n_docs"))
    )
    ctot = wc.groupBy("_lbl").agg(F.sum("_c").cast("long").alias("_t"))
    vocab = wc.select("w").distinct()
    n_vocab = vocab.count()  # model-grid dimension; vocabulary-sized
    n_docs = df.count()

    # dense V x C grid of micro log P(w|class), add-one smoothed
    dense = (
        vocab.crossJoin(F.broadcast(cls.join(ctot, "_lbl")))
        .join(wc, ["w", "_lbl"], "left")
        .select(
            "w",
            "_lbl",
            _ln_ratio_micro(
                F.coalesce(F.col("_c"), F.lit(0)) + F.lit(1),
                F.col("_t") + F.lit(int(n_vocab)),
            ).alias("_lw"),
        )
    )
    prior = cls.select(
        "_lbl",
        _ln_ratio_micro(F.col("_n_docs"), F.lit(int(n_docs))).alias("_prior"),
    )

    dt = dwc.select(id_col, "w", "_nw")
    score = (
        dt.join(F.broadcast(dense), "w")
        .groupBy(id_col, "_lbl")
        .agg(F.sum(F.col("_nw") * F.col("_lw")).cast("long").alias("_s0"))
        .join(F.broadcast(prior), "_lbl")
        .select(id_col, "_lbl", (F.col("_s0") + F.col("_prior")).alias("_s"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_s"), F.col("_lbl"))
    best = (
        score.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        best.join(df.select(id_col, label_col), id_col)
        .select(
            id_col,
            label_col,
            F.col("_lbl").alias(f"pred_{label_col}"),
            F.col("_s").alias("score_micro"),
            F.when(F.col("_lbl") == F.col(label_col), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("correct"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_label: str,
    label_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    select_k: int = 100,
) -> DataFrame:
    """DSIR hashed-unigram importance weights: weight(doc) =
    sum_b n_doc(b) * [ln p_target(b) - ln p_raw(b)] over md5-hashed word
    buckets, add-one smoothed, in integer micro-nats. Target = docs whose
    `label_col` equals `target_label`; raw = the whole corpus.

    Output: (id, n_tokens, weight_micro, selected) — selected = 1 for the
    top-`select_k` docs by (weight desc, id), i.e. the deterministic
    greedy variant of DSIR's importance resampling. The top-k is
    orderBy+limit (TakeOrdered, a distributed top-k — NO global sort)
    broadcast back as a semi-flag, mirroring oov_stats' vocab. The bucket
    model is O(n_buckets) rows (dense, zero-count buckets included) and
    broadcast; the per-doc pass is one shuffle keyed by doc.
    """
    spark = df.sparkSession
    bkt = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long")
        % n_buckets
    ).alias("b")
    tok = df.select(
        F.col(id_col),
        (F.col(label_col) == target_label).alias("_is_t"),
        F.explode(words_col(F.col(text_col))).alias("w"),
    ).select(id_col, "_is_t", bkt)

    grid = spark.range(n_buckets).select(F.col("id").alias("b"))
    ct = tok.where("_is_t").groupBy("b").agg(F.count("*").alias("_ct"))
    cr = tok.groupBy("b").agg(F.count("*").alias("_cr"))
    tt = tok.where("_is_t").count()
    tr = tok.count()
    model = (
        grid.join(ct, "b", "left")
        .join(cr, "b", "left")
        .select(
            "b",
            (
                _ln_ratio_micro(
                    F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1),
                    F.lit(int(tt) + int(n_buckets)),
                )
                - _ln_ratio_micro(
                    F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(1),
                    F.lit(int(tr) + int(n_buckets)),
                )
            ).alias("_llr"),
        )
    )
    per_doc = (
        tok.groupBy(id_col, "b")
        .agg(F.count("*").cast("long").alias("_n"))
        .join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.sum("_n").cast("long").alias("n_tokens"),
            F.sum(F.col("_n") * F.col("_llr")).cast("long").alias("weight_micro"),
        )
    )
    topk = (
        per_doc.orderBy(F.desc("weight_micro"), F.col(id_col))
        .limit(int(select_k))
        .select(F.col(id_col), F.lit(1).alias("_sel"))
    )
    return (
        per_doc.join(F.broadcast(topk), id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "weight_micro",
            F.coalesce(F.col("_sel"), F.lit(0)).cast("long").alias("selected"),
        )
    )


def stump_split_gain(
    df: DataFrame,
    feature_col: str,
    target_col,
) -> DataFrame:
    """Decision-stump split quality over EVERY candidate cut of an
    integer feature — the univariate feature-importance primitive
    (CART Gini gain) computed entirely on the value histogram: one
    count agg to (value, n, n_pos), one cumulative pass over the
    bounded value spine, then the exact gain per cut.  No row ever
    enters a window — at 10^12 rows the spine is still just the
    distinct feature values (the qa22 histogram discipline).

    Binary Gini via the 2pq form keeps everything rational:
    gain(v) = 2·[A·B/n² − (a_l·b_l/n_l + a_r·b_r/n_r)/n]  (a=pos,
    b=neg; l/r = rows with feature <= v / > v).  Products stay in
    int64 (counts ≤ ~2^31 each side); the assembly runs in doubles in
    a fixed mirrored order and micro-rounds once.  Cuts with an empty
    side emit NULL gain.

    Output per cut: cut_value, n_left, pos_left, gain_micro.
    """
    t = (
        target_col if not isinstance(target_col, str) else F.col(target_col)
    ).cast("boolean")
    hist = (
        df.select(
            F.col(feature_col).cast("long").alias("_v"),
            t.cast("long").alias("_y"),
        )
        .groupBy("_v")
        .agg(
            F.count("*").cast("long").alias("_c"),
            F.sum("_y").cast("long").alias("_p"),
        )
    )
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "_v",
        F.sum("_c").over(w).cast("long").alias("_nl"),
        F.sum("_p").over(w).cast("long").alias("_pl"),
    )
    tot = hist.agg(
        F.sum("_c").cast("long").alias("_n"),
        F.sum("_p").cast("long").alias("_a"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    nl = F.col("_nl").cast("double")
    nr = (F.col("_n") - F.col("_nl")).cast("double")
    al = F.col("_pl").cast("double")
    bl = (F.col("_nl") - F.col("_pl")).cast("double")
    ar = (F.col("_a") - F.col("_pl")).cast("double")
    br = (F.col("_n") - F.col("_nl") - F.col("_a") + F.col("_pl")).cast(
        "double"
    )
    a = F.col("_a").cast("double")
    b = (F.col("_n") - F.col("_a")).cast("double")
    n = F.col("_n").cast("double")
    gain = 2.0 * (a * b / (n * n) - (al * bl / nl + ar * br / nr) / n)
    ok = (F.col("_nl") > 0) & (F.col("_nl") < F.col("_n"))
    return j.select(
        F.col("_v").alias("cut_value"),
        F.col("_nl").alias("n_left"),
        F.col("_pl").alias("pos_left"),
        F.when(ok, F.round(gain * 1_000_000).cast("long")).alias(
            "gain_micro"
        ),
    )
