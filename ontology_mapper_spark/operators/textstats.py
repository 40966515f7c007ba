"""Text-analysis operators for training-data pipelines (all native Columns).

Language-ID, quality scoring, token counting, and document fingerprinting —
each a pure `pyspark.sql.functions` expression chain (whole-stage codegen,
no Python), designed to run inside the same scan as other per-doc work so a
100 TB corpus is read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "for", "on",
    "with", "at", "by", "from", "as", "that", "this", "it", "be",
)

# crude n-gram cues per language — a deterministic heuristic, not a model
_LANG_CUES = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def words_col(text):
    return F.filter(
        F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " "),
        lambda w: F.length(w) > 0,
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_words, n_chars_norm, avg_word_len, stopword_ratio, punct_ratio."""
    w = words_col(F.col(text_col))
    n_words = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    n_chars = F.length(F.col(text_col))
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars_norm", n_chars)
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x)) / n_words)
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """0–100 heuristic quality score from the text stats: length band +
    stopword presence + punctuation sanity. Deterministic, monotone in each
    component — meant for percentile-based corpus filtering."""
    d = with_text_stats(df, text_col)
    length_pts = F.least(F.col("n_words").cast("double") / 2.0, F.lit(40.0))
    stop_pts = F.least(F.col("stopword_ratio") * 200.0, F.lit(40.0))
    punct_pts = F.when(F.col("punct_ratio") <= 0.1, F.lit(20.0)).otherwise(
        F.greatest(F.lit(0.0), F.lit(20.0) - F.col("punct_ratio") * 100.0)
    )
    return d.withColumn("quality_score", length_pts + stop_pts + punct_pts)


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds lang_guess from stopword-cue votes; 'und' when no cue hits.

    Tie policy is EXPLICIT (struct max over (hits, priority)): later
    languages in _LANG_CUES order win ties — es > fr > de > en. Relying on
    the lang string itself for the tiebreak would silently change the
    policy ('fr' > 'es' lexicographically)."""
    w = words_col(F.col(text_col))
    scores = []
    for prio, (lang, cues) in enumerate(_LANG_CUES.items()):
        cue_arr = F.array(*[F.lit(c) for c in cues])
        scores.append(
            F.struct(
                F.size(F.filter(w, lambda x: F.array_contains(cue_arr, x))).alias("hits"),
                F.lit(prio).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_guess",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint of sorted distinct words (word-order
    independent — catches shuffled boilerplate), plus exact sha256."""
    w = F.array_sort(F.array_distinct(words_col(F.col(text_col))))
    return df.withColumn(
        "fingerprint64", F.xxhash64(F.concat_ws(" ", w))
    ).withColumn(
        "sha256", F.sha2(F.encode(F.concat_ws(" ", w), "utf-8"), 256)
    )


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-proxy quality signal: per-document negative log-likelihood
    under a bigram LM trained on the corpus itself, with add-one smoothing —
    the CCNet/Gopher-family "LM surprise" filter, self-contained (no external
    model):  nll(w1,w2) = -ln((c(w1,w2)+1)/(c(w1·)+V)).

    Output: (id, n_bigrams, nll_micro_sum, nll_avg_micro) — ALL integers.
    The per-bigram nll is micro-fixed-pointed ONCE per distinct (w1,w2) from
    exact integer counts, then integer-summed per doc, so a SQL oracle
    reproduces it bit-exactly (no raw double summation anywhere).

    Scale shape: bigrams are built from the words array natively via a
    zip_with of the array against its own 1-shifted tail — no window, no
    shuffle per doc, and crucially no array reference inside a lambda
    body (higher-order lambdas re-evaluate their body per element, so the
    earlier try_element_at(w, i+2) form re-ran normalize+split once per
    word — the same O(len²) trap fixed in shingles_all_col). Three corpus-wide
    aggregations (context counts, bigram counts, vocab size) all get
    map-side partial agg, so zipfian-hot words don't straggle; the final
    (w1,w2)-keyed join back to doc bigrams is AQE-handled. One extra scan
    vs the single-pass stats — the LM table is meant to be computed once
    per corpus snapshot and reused.
    """
    w = words_col(F.col(text_col))
    tail = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(1)))
    pairs = F.filter(
        F.zip_with(
            w, tail,
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    bg = df.select(
        F.col(id_col), F.explode(pairs).alias("p")
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    c1 = bg.groupBy("w1").agg(F.count("*").alias("c_ctx"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_bg"))
    vocab = (
        df.select(F.explode(w).alias("wd"))
        .agg(F.countDistinct("wd").alias("v"))
    )
    nll = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log((F.col("c_bg") + F.lit(1.0)) / (F.col("c_ctx") + F.col("v")))
                * 1e6
            )
            .cast("bigint")
            .alias("nll_micro"),
        )
    )
    return (
        bg.join(nll, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("nll_micro").alias("nll_micro_sum"),
        )
        .withColumn(
            "nll_avg_micro",
            F.floor(F.col("nll_micro_sum") / F.col("n_bigrams")).cast("bigint"),
        )
    )


def token_count_col(text, pattern: str = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"):
    """BPE-ish token count: words plus standalone punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signal: the character fraction of the most
    frequent word n-gram (Rae et al. 2021 'Scaling Language Models' uses
    exactly this family of top-n-gram fraction filters for web-corpus
    cleaning). Output: (id, n_grams, top_gram, top_count, rep_micro) where
    rep_micro = round(top_count·len(top_gram)/n_chars·1e6).

    Scale shape: explode n-gram OCCURRENCES → groupBy(id, gram) count
    (map-side partial agg collapses repeats) → per-id top-1 via a window
    rank with a total order (count desc, gram) — one shuffle keyed by id,
    no all-pairs, no Python.
    """
    from pyspark.sql import Window

    from .dedup import normalized_text_col, shingles_all_col

    # _n_chars must be computed in its OWN projection BELOW the explode:
    # expressions written in the same select as a generator are placed in
    # the post-Generate Project and re-evaluated once per OUTPUT row
    # (measured: the normalize-regex ran 265k× instead of 5k× at sf0.1,
    # +1.3s). A pre-Generate Project survives as the Generate's child.
    pre = df.select(
        F.col(id_col),
        F.length(normalized_text_col(F.col(text_col))).alias("_n_chars"),
        F.col(text_col),
    )
    grams = pre.select(
        F.col(id_col),
        F.col("_n_chars"),
        F.explode(shingles_all_col(F.col(text_col), ngram_n)).alias("gram"),
    )
    counts = grams.groupBy(id_col, "_n_chars", "gram").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), F.col("gram"))
    totals = Window.partitionBy(id_col)
    return (
        counts.withColumn("n_grams", F.sum("cnt").over(totals))
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("gram").alias("top_gram"),
            F.col("cnt").alias("top_count"),
            F.round(
                F.col("cnt") * F.length("gram") / F.col("_n_chars") * 1e6
            )
            .cast("bigint")
            .alias("rep_micro"),
        )
    )


def percentile_trim(
    df: DataFrame,
    value_col,
    by: str | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    order_tiebreak: str = "doc_id",
) -> DataFrame:
    """Exact rank-based outlier trim — the CCNet/Gopher-style length/
    quality percentile filter (drop the shortest p% and longest q% of
    docs per language before training), made DETERMINISTIC: instead of
    approx_percentile (whose sketch is partitioning-dependent), every row
    gets an exact rank under the total order (value, tiebreak) within its
    group, and rows survive iff

        ceil(lower·n) <= rank <= ceil(upper·n)        (1-based rank)

    which is engine-reproducible integer math (the SQL oracle replays the
    identical window). `value_col` may be a Column expression (e.g.
    token_count_col(F.col("text"))). One shuffle on the group key; the
    two window functions share it.

    At 100 TB the exact window is a per-group sort — fine for grouped
    trims (per-language/per-source groups shard the sort); for a single
    global group at extreme scale, swap in approx_percentile bounds
    explicitly and accept the nondeterminism.
    """
    from pyspark.sql import Window

    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    v = value_col if not isinstance(value_col, str) else F.col(value_col)
    part = [by] if by else []
    w = Window.partitionBy(*part).orderBy(v.asc(), F.col(order_tiebreak).asc())
    wn = Window.partitionBy(*part)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .where(
            (F.col("_rank") >= F.ceil(F.col("_n") * F.lit(lower)))
            & (F.col("_rank") <= F.ceil(F.col("_n") * F.lit(upper)))
        )
        .drop("_rank", "_n")
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 50,
) -> DataFrame:
    """First-iteration BPE merge statistics (Sennrich et al. 2016):
    corpus-weighted counts of adjacent symbol pairs, where symbols are
    the characters of each word plus the '</w>' end-of-word marker. The
    argmax pair IS the first BPE merge; the top-k table is what a
    tokenizer-training job inspects each round.

    Distinct-first discipline (the q66/D1 shape): pair extraction runs
    once per DISTINCT word — word frequencies are aggregated first
    (map-side combined, zipf-hot words collapse early), then each
    distinct word's pairs are exploded carrying its corpus frequency, so
    the per-character work is O(|vocab|·word_len), not O(corpus tokens).
    Counts are exact integer sums of bigint frequencies. Total-order
    rank (n desc, pair asc) — reproducible top-k in any engine.

    Output: (pair, n, rank) with rank 1..top_k.
    """
    from pyspark.sql import Window

    from .dedup import normalized_text_col

    words = df.select(
        F.explode(F.split(normalized_text_col(F.col(text_col)), " ")).alias("w")
    ).where(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count("*").alias("wf"))
    syms = F.concat(
        F.regexp_extract_all(F.col("w"), F.lit("."), 0), F.array(F.lit("</w>"))
    )
    vocab = vocab.select("wf", syms.alias("_s"))
    pairs = F.zip_with(
        F.col("_s"),
        F.slice(F.col("_s"), 2, F.greatest(F.size("_s") - 1, F.lit(1))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ex = vocab.select(
        "wf", F.explode(F.filter(pairs, lambda x: x.isNotNull())).alias("pair")
    )
    counts = ex.groupBy("pair").agg(F.sum("wf").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("pair", F.col("n").cast("long").alias("n"), F.col("rank").cast("long").alias("rank"))
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    tiebreak_col: str | None = None,
) -> DataFrame:
    """EXACT type-1 (inverted-CDF) quantiles per group: the value at
    rank ceil(q·n) under the total order (value, tiebreak). No
    interpolation — outputs are actual data values, so integer columns
    stay integers and any engine reproduces them bit-for-bit (the same
    reason percentile_trim uses rank cutoffs). Quantiles are percent-
    granular and the target rank is computed in EXACT integer
    arithmetic — ceil(p·n/100) = (p·n + 99) div 100 — so there is no
    IEEE ceil-at-a-boundary hazard at all.

    One shuffle: the rank window and the count window share the group
    partitioning. Output: (*group_cols, n, q50, q90, ... named qNN).
    """
    from pyspark.sql import Window

    pcts = []
    for q in quantiles:
        p = int(round(q * 100))
        if abs(p - q * 100) > 1e-9:
            raise ValueError(f"quantiles must be percent-granular, got {q}")
        pcts.append(p)

    order = [F.col("_v").asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    wn = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    ).select(
        *group_cols,
        "_v",
        F.row_number().over(w).alias("_r"),
        F.count("*").over(wn).alias("_n"),
    )
    aggs = [F.max("_n").cast("long").alias("n")]
    for p in pcts:
        aggs.append(
            F.max(
                F.when(
                    F.col("_r") == F.expr(f"(({p} * _n) + 99) div 100"),
                    F.col("_v"),
                )
            ).alias(f"q{p:02d}")
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def oov_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 500,
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus top-`vocab_size`
    word vocabulary — the tokenizer-fit signal (high OOV = text the
    tokenizer will shred into bytes; a spike flags encoding junk or an
    off-domain source).

    Scale: the vocab is orderBy+limit — Spark plans TakeOrdered (a
    distributed top-k, NO single-partition sort) with a (count desc,
    word) total order; it then broadcast-joins against the exploded
    tokens, and the per-doc agg is one map-side-combined groupBy.
    Docs with zero tokens have no rows to explode and are absent from
    the output (documented).  oov_micro = round(1e6·n_oov/n_tokens),
    integer counts with one terminal division.
    """
    tok = df.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    vocab = (
        cnt.orderBy(F.desc("c"), "w")
        .limit(int(vocab_size))
        .select("w", F.lit(1).alias("_inv"))
    )
    marked = tok.join(F.broadcast(vocab), "w", "left")
    agg = marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    return agg.withColumn(
        "oov_micro",
        F.round((F.col("n_oov") * 1_000_000).cast("double") / F.col("n_tokens"))
        .cast("long"),
    )


def ngram_gap_candidates(
    docs: DataFrame,
    patterns: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_top: int = 50,
) -> DataFrame:
    """Ontology gap mining: the unigram/bigram spans the mention detector
    CANNOT match (no dictionary pattern), ranked by corpus frequency —
    the curation queue for growing the term dictionary (the reference
    grows its dictionary by hand per missed term via the interactive
    loop, cli/interface.py:361-366; this is that queue computed corpus-
    wide in one pass).

    `patterns` = one string column `pattern` (the detector's surface
    forms, dictionary-sized, broadcast).  Candidate spans mirror the
    detector's span universe (whitespace unigrams + adjacent bigrams);
    the anti-join is broadcast, the count one map-side-combined groupBy,
    and the top-N an orderBy+limit (TakeOrdered — distributed top-k, no
    global sort).

    Output: (span, n) — the N most frequent unmatched spans, ties broken
    by span.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_i", "_w"),
    )
    w2 = Window.partitionBy("_id").orderBy("_i")
    grams = (
        words.withColumn("_nxt", F.lead("_w").over(w2))
        .select(
            F.explode(
                F.array(
                    F.col("_w"),
                    F.when(
                        F.col("_nxt").isNotNull(),
                        F.concat_ws(" ", "_w", "_nxt"),
                    ),
                )
            ).alias("span")
        )
        .where(F.col("span").isNotNull())
    )
    unmatched = grams.join(
        F.broadcast(patterns.select(F.col("pattern").alias("span")).distinct()),
        "span",
        "left_anti",
    )
    cnt = unmatched.groupBy("span").agg(F.count("*").cast("long").alias("n"))
    return cnt.orderBy(F.desc("n"), "span").limit(int(n_top))


def bpe_merge_rounds(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
    min_pair_count: int = 1,
    target_vocab: int | None = None,
) -> DataFrame:
    """Multi-round BPE merge TRAINING (Sennrich et al. 2016) — the
    iterative loop ``bpe_pair_counts`` is one step of: each round counts
    corpus-weighted adjacent symbol pairs, adopts the argmax pair as a
    merge rule (total order: count desc, pair asc), applies it greedily
    left-to-right to every word, and recounts.

    Greedy merge without UDFs: words live as DOUBLED-delimiter symbol
    strings ("hi" → '||h||i||'); the literal replace '|x||y|' → '|xy|'
    consumes one '|' from each side, so (a) non-overlapping left-to-
    right replace IS greedy BPE ('a a a a' → (aa)(aa), not (aa)a a), and
    (b) every boundary stays doubled after the merge — the invariant
    holds for the next round, and a symbol that merely ends in x can
    never false-match (its 'x' is not preceded by '|'). Words are
    restricted to [a-z0-9]+ (regex '.'-semantics differ across engines
    outside ASCII).

    Distinct-first: the whole loop runs over the (word, freq) vocab
    table — O(|vocab|·len) per round regardless of corpus size; each
    round's vocab is pinned (persist + count) so round r doesn't replay
    rounds 1..r−1 2^r times (the CLAUDE.md iterative-recompute trap).
    The per-round argmax is ONE collected row (the kmeans-centroid
    class of driver collect: dictionary-sized by construction), which
    is also what the replace literal needs.

    Stopping rules (real tokenizer training, not just fixed unrolls):
    the loop ends early when no adjacent pair remains, when the best
    pair's corpus count drops below ``min_pair_count``, or when the
    symbol vocabulary reaches ``target_vocab`` (= distinct initial
    symbols + adopted merges; each round adopts exactly one new
    symbol).  Defaults reproduce the fixed-``rounds`` behavior exactly.

    Output: one row per merge rule — (round, sym_x, sym_y, pair_count).
    """
    from .dedup import normalized_text_col

    words = (
        df.select(
            F.explode(F.split(normalized_text_col(F.col(text_col)), " ")).alias("w")
        )
        .where(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    cur = words.select(
        F.concat(
            F.lit("||"), F.regexp_replace(F.col("w"), "(.)", "$1||")
        ).alias("s"),
        "f",
    )
    max_rounds = int(rounds)
    if target_vocab is not None:
        # each adopted merge adds exactly one symbol to the vocabulary,
        # so the budget in rounds is target_vocab - |initial symbols|
        n_base = (
            words.select(F.explode(F.split("w", "")).alias("_c"))
            .where(F.col("_c") != "")
            .agg(F.countDistinct("_c"))
            .collect()[0][0]
        )
        max_rounds = min(max_rounds, max(0, int(target_vocab) - int(n_base)))
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, max_rounds + 1):
        cur = cur.persist()
        cur.count()
        arr = cur.select(
            F.split(F.expr("trim(BOTH '|' FROM s)"), "\\|\\|").alias("a"), "f"
        )
        pairs = (
            arr.select(
                F.explode(
                    F.zip_with(
                        F.col("a"),
                        F.slice(
                            F.col("a"), 2, F.greatest(F.size("a") - 1, F.lit(1))
                        ),
                        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
                    )
                ).alias("p"),
                "f",
            )
            .where(F.col("p.y").isNotNull())
            .select(F.col("p.x").alias("sym_x"), F.col("p.y").alias("sym_y"), "f")
        )
        top1 = (
            pairs.groupBy("sym_x", "sym_y")
            .agg(F.sum("f").cast("long").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "sym_x", "sym_y")
            .limit(1)
            .collect()
        )
        if not top1 or top1[0]["pair_count"] < int(min_pair_count):
            break
        x, y, c = top1[0]["sym_x"], top1[0]["sym_y"], int(top1[0]["pair_count"])
        rules.append((r, x, y, c))
        cur = cur.select(
            F.replace(
                F.col("s"), F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|")
            ).alias("s"),
            "f",
        )
    return df.sparkSession.createDataFrame(
        rules, "round int, sym_x string, sym_y string, pair_count long"
    )


def novelty_curve(
    df,
    text_col: str,
    ts_col,
    shingle_n: int = 2,
):
    """Corpus novelty curve: per day, how many of the day's distinct
    word n-grams were NEVER seen on an earlier day -- the diminishing-
    returns meter for a crawl ("yesterday 40% of bigrams were new,
    today 4%: this source is mined out") and the aggregate view of what
    near-dup removal will delete before it runs.

    First-seen day per distinct shingle is ONE min-agg over the
    exploded shingle stream (map-side combinable); the day-level rollup
    counts distinct shingles touched vs born that day, with the
    cumulative vocabulary via a window over the (tiny) day table.  All
    ratios micro-ints.

    Output per day: day 'yyyy-MM-dd', n_shingles (distinct touched),
    n_new, novelty_micro (new/touched), cum_new (vocab size to date).
    """
    from .dedup import shingles_col

    base = df.select(
        F.to_date(
            ts_col if not isinstance(ts_col, str) else F.col(ts_col)
        ).alias("_d"),
        F.explode(shingles_col(F.col(text_col), shingle_n)).alias("_g"),
    ).distinct()
    from pyspark.sql import Window

    first = base.groupBy("_g").agg(F.min("_d").alias("_born"))
    per_day = (
        base.join(first, "_g")
        .groupBy("_d")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("_d") == F.col("_born")).cast("long"))
            .cast("long")
            .alias("n_new"),
        )
    )
    w = Window.orderBy("_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.date_format("_d", "yyyy-MM-dd").alias("day"),
        "n_shingles",
        "n_new",
        F.round(F.col("n_new") * F.lit(1_000_000) / F.col("n_shingles"))
        .cast("long")
        .alias("novelty_micro"),
        F.sum("n_new").over(w).cast("long").alias("cum_new"),
    )


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document from
    deterministic regex proxies — the classic readability gate for
    training-corpus curation (Flesch 1948; Kincaid 1975), kept fully
    engine-portable: syllables ≈ vowel-group runs [aeiouy]+ (the
    standard cheap proxy), sentences = terminator runs [.!?]+ (min 1),
    words = the corpus-canonical whitespace tokenizer.

    FRE  = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
    FKGL = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    All three counts are int64; each ratio term is ONE division
    micro-rounded independently, then integer-combined — no double
    ever accumulates.  Map-only (no shuffle, no Python): three regex
    counters in a single projection.  Docs with zero words drop out
    (scores undefined).

    Output: id, n_words, n_sentences, n_syllables, fre_micro,
    fkgl_micro.
    """
    t = F.col(text_col)
    n_words = F.size(words_col(t))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    n_syl = F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), 0))
    base = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syl.cast("long").alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    wps = F.round(F.col("n_words") * F.lit(1_015_000) / F.col("n_sentences")).cast(
        "long"
    )
    spw = F.round(
        F.col("n_syllables") * F.lit(84_600_000) / F.col("n_words")
    ).cast("long")
    gl_wps = F.round(
        F.col("n_words") * F.lit(390_000) / F.col("n_sentences")
    ).cast("long")
    gl_spw = F.round(
        F.col("n_syllables") * F.lit(11_800_000) / F.col("n_words")
    ).cast("long")
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(206_835_000) - wps - spw).cast("long").alias("fre_micro"),
        (gl_wps + gl_spw - F.lit(15_590_000)).cast("long").alias("fkgl_micro"),
    )


def heaps_law_fit(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Heaps'-law fit V = K·N^β of vocabulary growth against corpus
    size, from the per-day cumulative (tokens, distinct words) curve —
    the scaling-law audit that says whether a crawl still grows
    vocabulary (β near the corpus norm ~0.5) or is re-crawling itself
    (β → 0), and sizes tokenizer vocabularies before training.

    First-seen day per distinct word is ONE min-agg over the exploded
    token stream; daily token totals one count.  The day table (tiny)
    carries cumulative sums; β is the OLS slope in ln-ln space using
    zipf_moments' MILLI-nat trick — x = round(ln(cum_tokens)·1e3),
    y = round(ln(cum_vocab)·1e3) per day (ln ONCE per day on integer
    inputs), five exact integer moments, ONE terminal division.

    Output (single row): n_days, n_tokens, n_vocab, beta_micro,
    intercept_milli (ln K in milli-nats; K itself would need exp —
    report the log form, never evaluate exp).  NULL fit when < 2 days.
    """
    from pyspark.sql import Window

    base = df.select(
        F.to_date(
            ts_col if not isinstance(ts_col, str) else F.col(ts_col)
        ).alias("_day"),
        words_col(F.col(text_col)).alias("_ws"),
    )
    tok = base.select("_day", F.explode("_ws").alias("_w"))
    daily_tokens = tok.groupBy("_day").agg(
        F.count("*").cast("long").alias("_nt")
    )
    first_seen = tok.groupBy("_w").agg(F.min("_day").alias("_day"))
    daily_new = first_seen.groupBy("_day").agg(
        F.count("*").cast("long").alias("_nv")
    )
    wday = Window.orderBy("_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        daily_tokens.join(daily_new, "_day", "left")
        .select(
            "_day",
            "_nt",
            F.coalesce("_nv", F.lit(0)).cast("long").alias("_nv"),
        )
        .select(
            "_day",
            F.sum("_nt").over(wday).cast("long").alias("_ct"),
            F.sum("_nv").over(wday).cast("long").alias("_cv"),
        )
    )
    pts = curve.select(
        F.round(F.log(F.col("_ct").cast("double")) * 1_000)
        .cast("long")
        .alias("_x"),
        F.round(F.log(F.col("_cv").cast("double")) * 1_000)
        .cast("long")
        .alias("_y"),
        "_ct",
        "_cv",
    )
    mo = pts.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("_ct").cast("long").alias("n_tokens"),
        F.max("_cv").cast("long").alias("n_vocab"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
    )
    num = F.col("n_days") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n_days") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    staged = mo.select(
        "n_days",
        "n_tokens",
        "n_vocab",
        "_sx",
        "_sy",
        F.when(
            (F.col("n_days") >= 2) & (den > 0),
            F.round(num * F.lit(1_000_000) / den).cast("long"),
        ).alias("beta_micro"),
    )
    return staged.select(
        "n_days",
        "n_tokens",
        "n_vocab",
        "beta_micro",
        F.when(
            F.col("beta_micro").isNotNull(),
            F.round(
                (
                    F.col("_sy") * F.lit(1_000_000)
                    - F.col("beta_micro") * F.col("_sx")
                )
                / (F.col("n_days") * F.lit(1_000_000))
            ).cast("long"),
        ).alias("intercept_milli"),
    )


def marginal_coverage(
    df,
    text_col: str,
    source_col: str,
    shingle_n: int = 2,
):
    """Greedy marginal vocabulary coverage per source: order sources by
    size (docs desc, name asc — a FIXED greedy order, not the NP-hard
    optimum), then report how many distinct word n-grams each source
    adds beyond everything before it — the "which feeds are redundant"
    view for mixture design, complementing qa45's pairwise containment
    with a sequential, budget-shaped answer.

    Every shingle's covering source is its MINIMUM order index (one
    min-agg over the distinct (source, shingle) index joined to the
    broadcast source-order dimension); the cumulative rollup is a
    window over the source spine.  Counts int64, shares single micro
    divisions.

    Output per source (greedy order): order_idx, source, n_docs,
    n_shingles (distinct in source), n_new, cum_new,
    marginal_micro (new/distinct-total).
    """
    from pyspark.sql import Window

    from .dedup import shingles_col

    tok = df.select(
        F.col(source_col).alias("_s"),
        F.explode(shingles_col(F.col(text_col), shingle_n)).alias("_g"),
    ).distinct()
    sizes = df.groupBy(F.col(source_col).alias("_s")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    worder = Window.orderBy(F.col("n_docs").desc(), F.col("_s"))
    order = sizes.select(
        "_s", "n_docs", F.row_number().over(worder).cast("int").alias("order_idx")
    )
    per_sh = (
        tok.join(F.broadcast(order.select("_s", "order_idx")), "_s")
        .groupBy("_g")
        .agg(F.min("order_idx").alias("_first"))
    )
    new_counts = per_sh.groupBy(F.col("_first").alias("order_idx")).agg(
        F.count("*").cast("long").alias("n_new")
    )
    in_source = tok.groupBy("_s").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    total = per_sh.agg(F.count("*").cast("long").alias("_tot"))
    wc = Window.orderBy("order_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = (
        order.join(in_source, "_s")
        .join(new_counts, "order_idx", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(total))
    )
    return joined.select(
        "order_idx",
        F.col("_s").alias(source_col),
        "n_docs",
        "n_shingles",
        "n_new",
        F.sum("n_new").over(wc).cast("long").alias("cum_new"),
        F.round(F.col("n_new") * F.lit(1_000_000) / F.col("_tot"))
        .cast("long")
        .alias("marginal_micro"),
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group tokenizer fertility: tokens per word and characters per
    token — the "how expensive is this language/source under my
    tokenizer" meter (fertility >> 1 predicts a context-window and
    training-cost penalty; the standard multilingual-corpus audit).

    Tokens use the BPE-ish `token_count_col` regex (words + standalone
    punctuation), words the shared normalized splitter — one scan, all
    int64 sums, two single micro divisions.

    Output per group: group, n_docs, n_words, n_tokens, n_chars,
    fertility_micro (tokens/words), chars_per_token_micro.
    """
    w = words_col(F.col(text_col))
    per = df.select(
        F.col(group_col).alias("_g"),
        F.size(w).cast("long").alias("_nw"),
        token_count_col(F.col(text_col)).cast("long").alias("_ntok"),
        F.length(F.col(text_col)).cast("long").alias("_nc"),
    ).groupBy("_g").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nw").cast("long").alias("n_words"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.sum("_nc").cast("long").alias("n_chars"),
    )
    return per.select(
        F.col("_g").alias(group_col),
        "n_docs",
        "n_words",
        "n_tokens",
        "n_chars",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_tokens") * F.lit(1_000_000) / F.col("n_words"))
            .cast("long"),
        ).alias("fertility_micro"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_chars") * F.lit(1_000_000) / F.col("n_tokens"))
            .cast("long"),
        ).alias("chars_per_token_micro"),
    )


def char_entropy_report(
    df,
    text_col: str,
    group_col: str,
    id_col: str,
    low_threshold_micro: int = 2_500_000,
) -> DataFrame:
    """Per-group character-entropy audit — the classic gibberish /
    binary-paste filter signal (CCNet/Gopher-family curation): per doc
    the Shannon entropy (nats) of its character distribution, rolled up
    per group as the average plus the count of docs under a low-entropy
    threshold (repetitive junk: e^2.5 ~ 12 effective characters).

    Integer-exact path (the q66 discipline): ln is evaluated ONCE per
    distinct integer count on two bounded tables — distinct per-(doc,
    char) counts c and distinct doc lengths n, both bounded by the max
    doc length, never corpus-sized — then micro-rounded, and every
    per-doc value is pure int64 arithmetic on those rounded micros:
    H_micro = ln_micro(n) − (Σ c·ln_micro(c)) div n.  No double is ever
    summed.  The char explode is positional (sequence + substr), the
    same portable idiom both engines evaluate identically.

    Output per group: (group, n_docs, avg_entropy_micro,
    low_entropy_docs).
    """
    from pyspark.sql import Window  # noqa: F401  (symmetry with siblings)

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_doc"),
        F.col(text_col).alias("_t"),
    ).where(F.length("_t") > 0)
    # one row per char position; _n carried from a pre-Generate
    # projection (the q63 explode trap: compute lengths BEFORE explode)
    sized = base.select("_g", "_doc", "_t", F.length("_t").alias("_n"))
    chars = sized.select(
        "_g",
        "_doc",
        "_t",
        "_n",
        F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("_p"),
    ).select(
        "_g", "_doc", "_n", F.expr("substring(_t, _p, 1)").alias("_c")
    )
    counts = chars.groupBy("_g", "_doc", "_n", "_c").agg(
        F.count("*").cast("long").alias("_cc")
    )
    ln_c = (
        counts.select(F.col("_cc").alias("_v"))
        .union(sized.select(F.col("_n").alias("_v")))
        .distinct()
        .select(
            "_v",
            F.round(F.log(F.col("_v").cast("double")) * 1_000_000)
            .cast("long")
            .alias("_ln_micro"),
        )
    )
    per_doc = (
        counts.join(F.broadcast(ln_c), counts["_cc"] == ln_c["_v"])
        .groupBy("_g", "_doc", "_n")
        .agg(F.sum(F.col("_cc") * F.col("_ln_micro")).alias("_s"))
    )
    h = per_doc.join(
        F.broadcast(ln_c.withColumnRenamed("_ln_micro", "_ln_n")),
        per_doc["_n"] == ln_c["_v"],
    ).select(
        "_g",
        (F.col("_ln_n") - F.expr("_s div _n")).cast("long").alias("_h"),
    )
    return h.groupBy(F.col("_g").alias(group_col)).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("sum(_h) div count(*)").cast("long").alias(
            "avg_entropy_micro"
        ),
        F.sum(
            F.when(F.col("_h") < int(low_threshold_micro), 1).otherwise(0)
        )
        .cast("long")
        .alias("low_entropy_docs"),
    )


def rake_keywords(
    df,
    text_col: str,
    id_col: str,
    stopwords: tuple[str, ...],
    k: int = 15,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010), corpus-level: split
    each doc into candidate phrases at stopword boundaries, score every
    word by degree/frequency — degree sums the length of each phrase
    the word occurs in (words in long phrases co-occur with more
    words), frequency counts occurrences — and return the top-k corpus
    keywords.  The cheap, deterministic "what is this corpus about"
    extractor for curation reports.

    Shape: tokenize with position, phrase id = running stopword count
    (window partitioned per DOC — bounded by doc length), one aggregate
    for phrase lengths, one for word stats, top-k via orderBy+limit
    (TakeOrderedAndProject under the (score, degree, word) total
    order).  score_micro = round(1e6·degree/frequency), a single
    integer division.

    Output (≤ k rows): (word, frequency, degree, score_micro).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(words_col(F.col(text_col))).alias("_idx", "_w"),
    )
    stop_arr = [str(s) for s in stopwords]
    wp = (
        Window.partitionBy("_doc")
        .orderBy("_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    phrased = toks.select(
        "_doc",
        "_w",
        F.sum(
            F.when(F.col("_w").isin(stop_arr), 1).otherwise(0)
        )
        .over(wp)
        .alias("_ph"),
    ).where(~F.col("_w").isin(stop_arr))
    wlen = Window.partitionBy("_doc", "_ph")
    occ = phrased.select(
        "_w", F.count("*").over(wlen).alias("_plen")
    )
    words = occ.groupBy(F.col("_w").alias("word")).agg(
        F.count("*").cast("long").alias("frequency"),
        F.sum("_plen").cast("long").alias("degree"),
    )
    return (
        words.select(
            "word",
            "frequency",
            "degree",
            F.round(F.col("degree") * F.lit(1_000_000) / F.col("frequency"))
            .cast("long")
            .alias("score_micro"),
        )
        .orderBy(
            F.col("score_micro").desc(),
            F.col("degree").desc(),
            F.col("word"),
        )
        .limit(int(k))
    )


def good_turing_richness(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Good-Turing unseen-probability mass + Chao1 richness per group —
    the "how much vocabulary have we NOT crawled yet" panel that sits
    next to qb02's Heaps-law fit (growth curve) and qb11's
    capture-recapture (two-snapshot overlap): GT p0 = N1/N estimates
    the probability the NEXT token is a new type; Chao1
    V + N1(N1-1)/(2(N2+1)) (bias-corrected) estimates total richness
    from singleton/doubleton counts alone.  Drives crawl-more vs
    dedup-harder budget calls per source.

    Integer-exact: token counts -> count-of-counts are pure int64
    aggregations; p0/chao1/hapax-share are each ONE micro-rounded
    division (chao1's V term stays a separate exact integer addend).
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(words_col(F.col(text_col))).alias("_w"),
    )
    counts = toks.groupBy("_g", "_w").agg(
        F.count("*").cast("long").alias("_c")
    )
    per = counts.groupBy("_g").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("v_types"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1_singletons"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2_doubletons"),
    )
    micro = F.lit(1_000_000)
    return per.select(
        F.col("_g").alias(group_col),
        "n_tokens",
        "v_types",
        "n1_singletons",
        "n2_doubletons",
        F.round(F.col("n1_singletons") * micro / F.col("n_tokens"))
        .cast("long")
        .alias("p0_micro"),
        (
            F.col("v_types") * F.lit(1_000_000)
            + F.round(
                F.col("n1_singletons")
                * (F.col("n1_singletons") - 1)
                * micro
                / (F.lit(2) * (F.col("n2_doubletons") + 1))
            ).cast("long")
        )
        .cast("long")
        .alias("chao1_micro"),
        F.round(F.col("n1_singletons") * micro / F.col("v_types"))
        .cast("long")
        .alias("hapax_share_micro"),
    )


def lexical_concentration(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Yule's K + Simpson's D of the token distribution per group —
    repetitiveness constants that, unlike raw TTR, are (asymptotically)
    length-invariant: K = 10⁴·(Σc² − N)/N² and D = Σc(c−1)/(N(N−1)),
    both driven by the count-of-counts the good_turing_richness scan
    already pays for.  High K/D = templated or boilerplate-heavy
    source (the "same 50 words over and over" signature that length
    quantiles miss).

    Σc² and Σc(c−1) are exact int64 sums; K and D are each ONE fixed
    scalar DAG with a terminal micro rounding (identical IEEE ops in
    both engines — never a double accumulation).

    Output: (group, n_tokens, v_types, sum_c2, yule_k_micro,
    simpson_d_micro).
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(words_col(F.col(text_col))).alias("_w"),
    )
    counts = toks.groupBy("_g", "_w").agg(
        F.count("*").cast("long").alias("_c")
    )
    per = counts.groupBy("_g").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("v_types"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("sum_c2"),
        F.sum(F.col("_c") * (F.col("_c") - 1)).cast("long").alias("_sd"),
    )
    return per.select(
        F.col("_g").alias(group_col),
        "n_tokens",
        "v_types",
        "sum_c2",
        F.round(
            F.lit(10000.0)
            * (F.col("sum_c2") - F.col("n_tokens"))
            * F.lit(1000000)
            / (F.lit(1.0) * F.col("n_tokens") * F.col("n_tokens"))
        )
        .cast("long")
        .alias("yule_k_micro"),
        F.when(
            F.col("n_tokens") > 1,
            F.round(
                F.lit(1000000.0)
                * F.col("_sd")
                / (F.lit(1.0) * F.col("n_tokens") * (F.col("n_tokens") - 1))
            ).cast("long"),
        ).alias("simpson_d_micro"),
    )


def mattr(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 25,
) -> DataFrame:
    """Moving-Average Type-Token Ratio per document — the
    length-robust lexical-diversity score (plain TTR collapses as
    docs grow; MATTR averages TTR over every w-token sliding window,
    so a 50-token and a 5000-token doc are comparable).

    Exact with NO per-window work: an occurrence at position i whose
    previous same-type occurrence is at prev contributes its "counted
    as distinct" to exactly the windows s ∈ [max(1, i−w+1, prev+1),
    min(i, L−w+1)] — so total distinct-count over ALL windows is one
    integer sum of clamped interval lengths (the qb78 forward-count
    idiom), and MATTR = total/(w·(L−w+1)) is ONE micro division per
    doc.  Docs shorter than w fall back to plain TTR = V/L
    (n_windows reported 0).  Only per-(doc) and per-(doc,word)
    windows — nothing global.

    Output: (id, n_tokens, n_types, n_windows, mattr_micro).
    """
    w = int(window)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(words_col(F.col(text_col))).alias("_p0", "_w"),
    ).select("_id", "_w", (F.col("_p0") + 1).alias("_pos"))
    wprev = Window.partitionBy("_id", "_w").orderBy("_pos")
    prevs = toks.select(
        "_id",
        "_pos",
        F.coalesce(F.lag("_pos").over(wprev), F.lit(0)).alias("_prev"),
    )
    lens = toks.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("_w").cast("long").alias("n_types"),
    )
    lens_k = lens.select(
        F.col("_id").alias("_lid"), F.col("n_tokens").alias("_ln")
    )
    contrib = (
        prevs.join(lens_k, prevs["_id"] == lens_k["_lid"])
        .withColumn("n_tokens", F.col("_ln"))
        .where(F.col("n_tokens") >= w)
        .select(
            F.col("_id").alias("_cid"),
            F.greatest(
                F.lit(0),
                F.least(F.col("_pos"), F.col("n_tokens") - w + 1)
                - F.greatest(
                    F.lit(1), F.col("_pos") - w + 1, F.col("_prev") + 1
                )
                + 1,
            ).alias("_ct"),
        )
        .groupBy("_cid")
        .agg(F.sum("_ct").cast("long").alias("_tot"))
    )
    return lens.join(
        contrib, lens["_id"] == contrib["_cid"], "left"
    ).select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "n_types",
        F.when(F.col("n_tokens") >= w, F.col("n_tokens") - w + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_windows"),
        F.when(
            F.col("n_tokens") >= w,
            F.round(
                F.col("_tot")
                * F.lit(1_000_000)
                / (F.lit(w) * (F.col("n_tokens") - w + 1))
            ).cast("long"),
        )
        .otherwise(
            F.round(
                F.col("n_types") * F.lit(1_000_000) / F.col("n_tokens")
            ).cast("long")
        )
        .alias("mattr_micro"),
    )


def kneser_ney_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-proxy under an interpolated Kneser-Ney bigram LM with
    absolute discount D = 3/4 — the classic smoothing upgrade over
    q66's add-one (Kneser & Ney 1995; the SRILM/KenLM default family):

        P(w2|w1) = (c12 - D)/c1  +  (D * N1(w1)/c1) * Ncont(w2)/T

    with c1 the context count (sum of bigrams starting w1), N1(w1) the
    distinct continuations of w1, Ncont(w2) the distinct left-contexts
    of w2, T the distinct bigram types.  D = 3/4 is exactly rational,
    so over a common denominator every probability is a ratio of
    int64s:  num = (4*c12 - 3)*T + 3*N1*Ncont,  den = 4*c1*T  (c12 >= 1
    for every scored bigram, so the discounted term never clamps), and
    nll_micro = ln_micro(den) - ln_micro(num) — ln of INTEGERS, taken
    once per distinct bigram (q66 discipline), integer-summed per doc.

    Scale shape mirrors bigram_nll: the zip_with bigram build (no
    per-element lambda re-evaluation), corpus aggregations with
    map-side combine, one (w1,w2)-keyed join back.  N1 and c1 come
    from ONE aggregation over the c12 table (rows per w1 = distinct
    continuations); Ncont is a second small agg of c12 by w2.

    Output: (id, n_bigrams, kn_nll_micro_sum, kn_avg_micro).
    """
    w = words_col(F.col(text_col))
    tail = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(1)))
    pairs = F.filter(
        F.zip_with(
            w, tail, lambda x, y: F.struct(x.alias("w1"), y.alias("w2"))
        ),
        lambda s: s["w2"].isNotNull(),
    )
    bg = df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c_bg"))
    ctx = c12.groupBy("w1").agg(
        F.sum("c_bg").cast("long").alias("c_ctx"),
        F.count("*").cast("long").alias("n1"),
    )
    ncont = c12.groupBy("w2").agg(
        F.count("*").cast("long").alias("ncont")
    )
    tt = c12.agg(F.count("*").cast("long").alias("t"))
    lnm = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")
    nll = (
        c12.join(ctx, "w1")
        .join(ncont, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            (
                lnm(4 * F.col("c_ctx") * F.col("t"))
                - lnm(
                    (4 * F.col("c_bg") - 3) * F.col("t")
                    + 3 * F.col("n1") * F.col("ncont")
                )
            ).alias("nll_micro"),
        )
    )
    return (
        bg.join(nll, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("nll_micro").cast("long").alias("kn_nll_micro_sum"),
        )
        .withColumn(
            "kn_avg_micro",
            F.floor(F.col("kn_nll_micro_sum") / F.col("n_bigrams")).cast(
                "bigint"
            ),
        )
    )


def gopher_filter_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 10_000,
) -> DataFrame:
    """Gopher-style document filter rule bundle (Rae et al. 2021 §A1,
    scaled to the corpus): word-count bounds, mean word length in
    [3, 10], alpha-word ratio >= 0.8, >= 2 stopwords.  Every ratio
    rule is an EXACT integer cross-multiplication (3n <= Σlen <= 10n;
    5·n_alpha >= 4·n_words) — no division anywhere, so the flags are
    trivially engine-portable.  Single scan, map-only, array ops in
    codegen.

    Output per doc: id, n_words, sum_wlen, n_alpha, n_stop,
    n_words_ok, wlen_ok, alpha_ok, stop_ok, passes.
    """
    w = words_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    pre = df.select(
        F.col(id_col),
        F.size(w).cast("long").alias("n_words"),
        F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("sum_wlen"),
        F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
        .cast("long")
        .alias("n_alpha"),
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop"),
    )
    n_ok = (F.col("n_words") >= int(min_words)) & (
        F.col("n_words") <= int(max_words)
    )
    wlen_ok = (3 * F.col("n_words") <= F.col("sum_wlen")) & (
        F.col("sum_wlen") <= 10 * F.col("n_words")
    )
    alpha_ok = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    stop_ok = F.col("n_stop") >= 2
    return pre.select(
        id_col,
        "n_words",
        "sum_wlen",
        "n_alpha",
        "n_stop",
        n_ok.alias("n_words_ok"),
        wlen_ok.alias("wlen_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (n_ok & wlen_ok & alpha_ok & stop_ok).alias("passes"),
    )


def burrows_delta(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_words: int = 25,
) -> DataFrame:
    """Burrows' Delta stylometric distance between sources — the
    classic authorship/provenance signal (Burrows 2002): z-score each
    source's relative frequency of the corpus's top function words,
    then Delta(a,b) = mean |z_a − z_b|.  Flags a source whose style
    drifts from the rest (scraper change, template contamination,
    machine-generated injection) even when topic words look fine.

    Exactness: per-(source, word) frequency is ONE micro-rounded
    division (per-cell rule) over a DENSE source × top-word grid
    (absent cells are exact zeros); the z-score uses the integer
    identity (K·f − Σf)/sqrt(K·Σf² − (Σf)²) — numerator and sqrt
    argument both int64, one mirrored division, z ≡ 0 where the
    variance is 0; Delta is an integer |z|-difference sum with one
    terminal division.  Top words are TakeOrdered (count desc, word),
    never a global rank.

    Output per source pair (a < b): source_a, source_b, n_words,
    delta_milli.
    """
    w = words_col(F.col(text_col))
    tok = df.select(F.col(source_col).alias("_s"), F.explode(w).alias("_w"))
    top = (
        tok.groupBy("_w")
        .agg(F.count("*").cast("long").alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("_w"))
        .limit(int(top_words))
        .select("_w")
    )
    counts = (
        tok.join(F.broadcast(top), "_w")
        .groupBy("_s", "_w")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    totals = tok.groupBy("_s").agg(F.count("*").cast("long").alias("_t"))
    grid = (
        totals.crossJoin(F.broadcast(top))
        .join(counts, ["_s", "_w"], "left")
        .select(
            "_s",
            "_w",
            F.round(
                F.coalesce(F.col("_c"), F.lit(0)).cast("double")
                * 1_000_000
                / F.col("_t")
            )
            .cast("long")
            .alias("_f"),
        )
    )
    per_w = grid.groupBy("_w").agg(
        F.count("*").cast("long").alias("_k"),
        F.sum("_f").cast("long").alias("_sf"),
        F.sum(F.col("_f") * F.col("_f")).cast("long").alias("_sff"),
    )
    dd = F.col("_k") * F.col("_sff") - F.col("_sf") * F.col("_sf")
    z = grid.join(F.broadcast(per_w), "_w").select(
        "_s",
        "_w",
        F.when(
            dd > 0,
            F.round(
                (F.col("_k") * F.col("_f") - F.col("_sf")).cast("double")
                * 1000
                / F.sqrt(dd.cast("double"))
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("_z"),
    )
    a = z.select(
        F.col("_s").alias("source_a"), "_w", F.col("_z").alias("_za")
    )
    b = z.select(
        F.col("_s").alias("source_b"), "_w", F.col("_z").alias("_zb")
    )
    return (
        a.join(b, "_w")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.round(
                F.sum(F.abs(F.col("_za") - F.col("_zb"))) / F.count("*")
            )
            .cast("long")
            .alias("delta_milli"),
        )
    )


def charclass_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-class composition per document — the encoding-junk /
    script-mix pre-filter (mojibake, binary spills, and wrong-charset
    scrapes all show up as non-ASCII or punctuation spikes long
    before a language model sees them).  Classes are ASCII-RANGE
    regexes ONLY ([A-Za-z], [0-9], \\s, the ASCII punct block), so
    Java regex and RE2 agree by construction — counts via the
    strip-and-measure idiom (q59), map-only, no UDF.

    Exact integers: per-class counts, n_other = length − Σ others;
    fractions micro-round once each; the dominant class is a CASE
    chain with a fixed comparison order (alpha ≥ digit ≥ space ≥
    punct ≥ other — ties resolve to the earlier class, both
    engines).

    Output per doc: id, n_chars_total, n_alpha, n_digit, n_space,
    n_punct, n_other, other_frac_micro, dominant_class.
    """
    t = F.col(text_col)
    cnt = lambda pat: F.length(t) - F.length(
        F.regexp_replace(t, pat, "")
    )
    pre = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars_total"),
        cnt("[A-Za-z]").cast("long").alias("n_alpha"),
        cnt("[0-9]").cast("long").alias("n_digit"),
        cnt(r"\s").cast("long").alias("n_space"),
        cnt(r"[!-/:-@\[-`{-~]").cast("long").alias("n_punct"),
    ).select(
        id_col,
        "n_chars_total",
        "n_alpha",
        "n_digit",
        "n_space",
        "n_punct",
        (
            F.col("n_chars_total")
            - F.col("n_alpha")
            - F.col("n_digit")
            - F.col("n_space")
            - F.col("n_punct")
        ).alias("n_other"),
    )
    dom = (
        F.when(
            (F.col("n_alpha") >= F.col("n_digit"))
            & (F.col("n_alpha") >= F.col("n_space"))
            & (F.col("n_alpha") >= F.col("n_punct"))
            & (F.col("n_alpha") >= F.col("n_other")),
            F.lit("alpha"),
        )
        .when(
            (F.col("n_digit") >= F.col("n_space"))
            & (F.col("n_digit") >= F.col("n_punct"))
            & (F.col("n_digit") >= F.col("n_other")),
            F.lit("digit"),
        )
        .when(
            (F.col("n_space") >= F.col("n_punct"))
            & (F.col("n_space") >= F.col("n_other")),
            F.lit("space"),
        )
        .when(F.col("n_punct") >= F.col("n_other"), F.lit("punct"))
        .otherwise(F.lit("other"))
    )
    return pre.select(
        id_col,
        "n_chars_total",
        "n_alpha",
        "n_digit",
        "n_space",
        "n_punct",
        "n_other",
        F.when(
            F.col("n_chars_total") > 0,
            F.round(
                F.col("n_other") * 1_000_000 / F.col("n_chars_total")
            ).cast("long"),
        ).alias("other_frac_micro"),
        dom.alias("dominant_class"),
    )


def markup_density(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    pipe_rate_flag_milli: int = 2000,
) -> DataFrame:
    """Markup / URL marker density per source — the boilerplate and
    table-contamination screen that runs BEFORE tokenization (a
    source whose docs average several pipes per line is a table dump,
    not prose; URL-dense sources are link farms).  All counts are the
    strip-and-measure idiom on LITERAL markers (replace, no regex at
    all — engine parity is trivial), summed per source with one
    rounded per-doc rate each.

    Output per source: source, n_docs, url_markers, pipes, hashes,
    backticks, urls_per_doc_milli, pipes_per_doc_milli,
    tabular_suspect.
    """
    t = F.col(text_col)
    lit_count = lambda lit: (
        (F.length(t) - F.length(F.expr(f"replace({text_col}, '{lit}', '')")))
        / len(lit)
    ).cast("long")
    per = df.select(
        F.col(source_col).alias("source"),
        lit_count("http").alias("_url"),
        lit_count("|").alias("_pipe"),
        lit_count("#").alias("_hash"),
        lit_count("`").alias("_tick"),
    ).groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_url").cast("long").alias("url_markers"),
        F.sum("_pipe").cast("long").alias("pipes"),
        F.sum("_hash").cast("long").alias("hashes"),
        F.sum("_tick").cast("long").alias("backticks"),
    )
    upd = F.round(F.col("url_markers") * 1000 / F.col("n_docs")).cast("long")
    ppd = F.round(F.col("pipes") * 1000 / F.col("n_docs")).cast("long")
    return per.select(
        "source",
        "n_docs",
        "url_markers",
        "pipes",
        "hashes",
        "backticks",
        upd.alias("urls_per_doc_milli"),
        ppd.alias("pipes_per_doc_milli"),
        (ppd >= int(pipe_rate_flag_milli)).alias("tabular_suspect"),
    )
