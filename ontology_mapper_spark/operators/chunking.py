"""Training-sequence preparation: context-window chunking and
concat-and-split sequence packing.

These are the operators between a curated corpus and a token-budgeted
training run: cut documents into model-context-sized windows, then pack
the stream into fixed-size training sequences. Both are deterministic
pure functions of the input (the packing order is an explicit, documented
sort key — no RNG, no wall clock).

Reference analogue: none — the reference feeds whole records downstream
(core/generator.py writes whole files); this is training-data curation
surface. Tokens here are whitespace words of normalized text (the same
normalization as the dedup family); a subword tokenizer would slot in by
replacing `_words_col` with a token-count column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text_col


def _words_col(text_col: F.Column) -> F.Column:
    return F.split(normalized_text_col(text_col), " ")


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking: emit windows of up to `max_tokens` words
    starting every `stride` words (stride < max_tokens ⇒ overlapping
    context, the usual long-document training prep). Start positions are
    0, stride, 2·stride, … while < n_words, so the tail is always
    covered; trailing chunks may be short (deterministic, documented —
    simpler than look-back tail alignment and identical in any engine).

    Output: (id, chunk_idx, start_tok, n_tok, chunk) with chunk_idx =
    start/stride. Map-only: words array → sequence of starts → explode →
    slice; no shuffle, no Python. The words array is projected BEFORE
    the explode so it is not re-evaluated per output chunk (the
    post-Generate re-evaluation trap).
    """
    if stride < 1 or max_tokens < 1:
        raise ValueError("stride and max_tokens must be >= 1")
    if stride > max_tokens:
        raise ValueError("stride > max_tokens would leave uncovered gaps")
    d = df.select(F.col(id_col), _words_col(F.col(text_col)).alias("_w"))
    d = d.select(
        F.col(id_col),
        "_w",
        F.sequence(
            F.lit(0), F.greatest(F.size("_w") - 1, F.lit(0)), F.lit(stride)
        ).alias("_starts"),
    )
    d = d.select(F.col(id_col), "_w", F.explode("_starts").alias("start_tok"))
    return d.select(
        F.col(id_col),
        (F.col("start_tok") / stride).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long"),
        F.least(
            F.lit(max_tokens).cast("long"),
            (F.size("_w") - F.col("start_tok")).cast("long"),
        ).alias("n_tok"),
        F.concat_ws(" ", F.slice("_w", F.col("start_tok") + 1, max_tokens)).alias(
            "chunk"
        ),
    )


def pack_concat_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_tokens: int = 256,
    num_shards: int = 64,
) -> DataFrame:
    """Concat-and-split sequence packing: lay all documents end-to-end in
    a deterministic global order and cut the stream every `seq_tokens`
    tokens — the packing used by GPT-style pretraining pipelines
    (documents may straddle sequence boundaries). Returns each document's
    position in the packed stream: (id, n_tok, global_start, first_seq,
    last_seq, n_seqs).

    The global order is (shard, id) with shard = md5-bucket of the id —
    an explicit parameter of the result, reproducible anywhere. The
    interesting part at 100 TB is the GLOBAL EXCLUSIVE PREFIX SUM of
    token counts, which a naive `Window.orderBy(...)` computes in ONE
    task (the single-partition-window scale killer). Instead, the
    classic two-phase distributed prefix sum:

      1. per-shard exclusive prefix sums (window partitioned BY shard —
         parallel across shards, one shuffle on the shard key);
      2. per-shard totals → exclusive cumsum over the `num_shards` rows
         (tiny single-partition window over num_shards rows, then
         broadcast-joined back).

    global_start = shard_offset + local_prefix. Size `num_shards` ≳
    cluster cores; skew is bounded because md5 buckets are uniform in
    the id, not the document length distribution's tail.
    """
    if seq_tokens < 1:
        raise ValueError("seq_tokens must be >= 1")
    d = df.select(
        F.col(id_col),
        F.size(_words_col(F.col(text_col))).cast("long").alias("n_tok"),
    )
    # 4 hex chars = 16 uniform bits — plenty for shard routing, and small
    # enough that any engine can recompose the integer from nibbles
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast(
            "long"
        ),
        F.lit(num_shards),
    )
    d = d.withColumn("shard", shard.cast("int"))
    w_local = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_local_prefix", F.coalesce(F.sum("n_tok").over(w_local), F.lit(0)))
    shard_tot = d.groupBy("shard").agg(F.sum("n_tok").alias("_tot"))
    w_shard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_tot.select(
        "shard", F.coalesce(F.sum("_tot").over(w_shard), F.lit(0)).alias("_shard_off")
    )
    out = d.join(F.broadcast(offsets), "shard")
    gs = F.col("_shard_off") + F.col("_local_prefix")
    return out.select(
        F.col(id_col),
        F.col("n_tok"),
        gs.alias("global_start"),
        F.floor(gs / seq_tokens).alias("first_seq"),
        F.floor((gs + F.greatest(F.col("n_tok"), F.lit(1)) - 1) / seq_tokens).alias(
            "last_seq"
        ),
        (
            F.floor((gs + F.greatest(F.col("n_tok"), F.lit(1)) - 1) / seq_tokens)
            - F.floor(gs / seq_tokens)
            + 1
        ).alias("n_seqs"),
    )


def assemble_conversation_examples(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    token_budget: int = 512,
) -> DataFrame:
    """Per-conversation training example under a token budget.

    Joins "<role>: <text>" lines in turn order and keeps the LONGEST
    PREFIX of turns whose cumulative whitespace-token count fits
    ``token_budget`` (chat-SFT context assembly: truncate the tail,
    never split a turn).  Conversations whose first turn already
    exceeds the budget disappear — deliberate and documented, matching
    a strict "example must fit" contract.

    Columns: conv, example, n_turns_used, n_tokens_used.

    Scale: running sum + group agg share the conv hash partitioning, so
    Spark plans ONE exchange; the collected struct list is bounded by
    the token budget (not by conversation length), so the agg state is
    O(budget) per conv regardless of input skew.
    """
    from .textstats import words_col

    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = df.select(
        F.col(conv_col),
        F.col(order_col),
        F.concat(F.col(role_col), F.lit(": "), F.col(text_col)).alias("_line"),
        F.size(words_col(F.col(text_col))).alias("_ntok"),
    ).withColumn("_cum", F.sum("_ntok").over(w))
    kept = run.where(F.col("_cum") <= token_budget)
    return kept.groupBy(conv_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("_line").alias("l")))
                ),
                lambda x: x["l"],
            ),
            "\n",
        ).alias("example"),
        F.count("*").cast("long").alias("n_turns_used"),
        F.sum("_ntok").cast("long").alias("n_tokens_used"),
    )


def padding_waste(
    df: DataFrame,
    text_col: str = "text",
    buckets: tuple[int, ...] = (64, 128, 256, 512),
) -> DataFrame:
    """Length-bucketed padding-waste audit: each document is assigned to
    the smallest bucket that fits its token count (overflow docs go to
    the largest bucket, truncated); per bucket, the real vs padded vs
    truncated token volume and the waste ratio — the number that decides
    the batch-bucket boundaries before a training run (padding is pure
    wasted FLOPs; truncation is lost data; the audit prices both).

    Single scan → single groupBy on the bucket id; token counts use the
    shared BPE-ish regex (`textstats.token_count_col`), all sums int64,
    waste is one micro division per bucket row.

    Output: (bucket, n_docs, real_tokens, pad_tokens, trunc_tokens,
    waste_micro) where waste_micro = pad/(n_docs·bucket).
    """
    from .textstats import token_count_col

    bs = sorted(int(b) for b in buckets)
    ntok = token_count_col(F.col(text_col)).cast("long")
    bucket = F.lit(bs[-1]).cast("long")
    for b in reversed(bs[:-1]):
        bucket = F.when(ntok <= b, F.lit(b).cast("long")).otherwise(bucket)
    per = df.select(
        bucket.alias("bucket"),
        ntok.alias("_n"),
    ).select(
        "bucket",
        F.least(F.col("_n"), F.col("bucket")).alias("_real"),
        (F.col("bucket") - F.least(F.col("_n"), F.col("bucket"))).alias(
            "_pad"
        ),
        F.greatest(F.col("_n") - F.col("bucket"), F.lit(0).cast("long")).alias(
            "_trunc"
        ),
    )
    agg = per.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_real").cast("long").alias("real_tokens"),
        F.sum("_pad").cast("long").alias("pad_tokens"),
        F.sum("_trunc").cast("long").alias("trunc_tokens"),
    )
    return agg.select(
        "bucket",
        "n_docs",
        "real_tokens",
        "pad_tokens",
        "trunc_tokens",
        F.round(
            F.col("pad_tokens")
            * F.lit(1_000_000)
            / (F.col("n_docs") * F.col("bucket"))
        )
        .cast("long")
        .alias("waste_micro"),
    )
