"""Sequence packing for LLM pretraining data (beyond-reference operator).

GPT-style concat-and-chunk packing: documents are laid out end-to-end in a
deterministic order and cut into fixed ``seq_len``-token training
sequences; a document crossing a boundary is split across the adjacent
sequences. The output is the *assignment map* (sequence id ↔ document
span), which downstream tokenization jobs consume to materialize each
sequence.

Scale design: the global token offset is a prefix sum. A naive
``Window.orderBy`` over the whole corpus collapses to ONE partition — a
non-starter at 100 TB — so the prefix sum is two-level: a within-shard
cumulative sum (window partitioned by shard) plus exclusive shard offsets
(one tiny aggregate, cumulated driver-side-small and broadcast back).
Everything is exact integer arithmetic → bit-reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.operators.text import tokens


def _precomputed_counts(n_tok_col: str, op: str) -> F.Column:
    """Precomputed token counts with a loud NULL guard.

    A NULL in a precomputed count column means the upstream tokenizer
    did not cover that row; silently clamping it (greatest() ignores
    NULLs) would pack/chunk with a fabricated width of 1 — fail the job
    instead, naming the column.
    """
    return F.when(
        F.col(n_tok_col).isNotNull(), F.col(n_tok_col).cast("long")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"{op}: NULL in n_tok_col '{n_tok_col}' — precomputed "
                "token counts must cover every row (filter or fill "
                "upstream)"
            )
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_size: int = 100_000,
    n_tok_col: str | None = None,
) -> DataFrame:
    """Assignment map of documents to fixed-length training sequences.

    Output: one row per (sequence, document) overlap —
    ``(seq_id, doc_id, doc_start, n_tok)``: tokens
    ``[doc_start, doc_start + n_tok)`` of ``doc_id`` land in sequence
    ``seq_id``. Documents are packed in ``id_col`` order.

    Token counts default to whitespace tokens of ``text_col``; pass
    ``n_tok_col`` to consume a PRECOMPUTED per-doc token count instead
    (the tokenizer hook — e.g. ``text.with_token_counts``, the greedy
    longest-match WordPiece counter: persist its counts and pack from
    those without re-reading the text; ``text_col`` is then ignored and
    never scanned). Counts are clamped to >= 1 so every document
    occupies the layout (empty docs would otherwise produce zero-width
    spans and ambiguous boundaries); a NULL in ``n_tok_col`` raises —
    a partially-populated count column would otherwise pack with
    fabricated widths.

    The two-level prefix sum keeps every stage wide: per-shard window
    (shard = ``id_col div shard_size``), then a #shards-row cumulative
    offset broadcast back — no single-partition global sort.
    """
    from pyspark.sql import Window

    n_tok = (
        _precomputed_counts(n_tok_col, "pack_sequences")
        if n_tok_col is not None
        else F.size(tokens(text_col)).cast("long")
    )
    # A NULL id has no position in a total-order layout: its shard key
    # is NULL, the broadcast offsets join never matches NULL, and the
    # row would VANISH from the assignment map silently (the same
    # silent-loss class the dedup NULL reviews closed). Fail loudly
    # instead, naming the column — the _precomputed_counts convention.
    # The guard must ride the SHARD KEY, not just the id projection:
    # the inner offsets join infers IsNotNull on its key, and Catalyst
    # pushes that filter below a plain projection — the NULL row would
    # be pruned before a guard on the id column ever evaluated
    # (observed: the test's raise never fired). With the CASE inside
    # the key expression, the pushed filter itself evaluates the raise.
    guarded_id = F.when(F.col(id_col).isNotNull(), F.col(id_col)).otherwise(
        F.raise_error(
            F.lit(
                f"pack_sequences: NULL in id_col '{id_col}' — the "
                "layout is a total order over ids; filter or assign "
                "ids upstream"
            )
        )
    )
    d = docs.select(
        F.col(id_col),
        F.greatest(n_tok, F.lit(1)).alias("__n_tok"),
        F.floor(guarded_id / F.lit(shard_size)).alias("__shard"),
    )
    w_in = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__cum_in_shard", F.sum("__n_tok").over(w_in))

    shard_tot = d.groupBy("__shard").agg(
        F.sum("__n_tok").alias("__shard_tok")
    )
    w_sh = (
        # Deliberately single-partition — but over the #shards AGGREGATE
        # (driver-small by construction), never the corpus; the offsets
        # broadcast back. Note partitionBy(lit(0)) does NOT silence
        # Spark's "No Partition Defined" warning: Catalyst constant-
        # folds the literal key, so the warning fires anyway (observed
        # in the bench log). The property that matters — the
        # SinglePartition exchange's input is the shard aggregate, not
        # the corpus — is plan-gated in tests/test_plans.py.
        Window.partitionBy(F.lit(0))
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = F.broadcast(
        shard_tot.withColumn(
            "__shard_off",
            F.sum("__shard_tok").over(w_sh) - F.col("__shard_tok"),
        ).select("__shard", "__shard_off")
    )

    laid = d.join(offsets, "__shard").select(
        id_col,
        "__n_tok",
        (F.col("__shard_off") + F.col("__cum_in_shard")).alias("__end"),
    ).withColumn("__start", F.col("__end") - F.col("__n_tok"))

    # A doc spans sequences floor(start/L) .. floor((end-1)/L); its
    # intersection with sequence s is [max(start, s*L), min(end, (s+1)*L)).
    first_seq = F.expr(f"__start div {seq_len}")
    last_seq = F.expr(f"(__end - 1) div {seq_len}")
    spanned = laid.select(
        id_col,
        "__start",
        "__end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    lo = F.greatest(F.col("__start"), F.col("seq_id") * seq_len)
    hi = F.least(F.col("__end"), (F.col("seq_id") + 1) * seq_len)
    return spanned.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col(id_col),
        (lo - F.col("__start")).cast("long").alias("doc_start"),
        (hi - lo).cast("long").alias("n_tok"),
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tok_col: str | None = None,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap.

    The long-context windowing op (chunk-for-embedding / sliding-window
    eval): one row per (document, chunk) — ``(doc_id, chunk_id,
    chunk_start, n_tok)`` where chunk ``i`` covers tokens
    ``[i * stride, i * stride + max_tokens)`` of the document,
    ``stride = max_tokens - overlap``. The final chunk is the remainder
    (shorter, never empty); a document is never split into chunks whose
    union misses a token, and consecutive chunks share exactly
    ``overlap`` tokens (except before a shorter final chunk). Token
    counts default to whitespace tokens of ``text_col``; pass
    ``n_tok_col`` for precomputed tokenizer counts (the same hook as
    :func:`pack_sequences`; ``text_col`` is then never scanned, and a
    NULL count raises rather than chunking a fabricated width).

    Scale shape: pure per-row integer math + one ``explode`` — zero
    shuffles, zero joins, fully pipelined with the scan; the chunk
    count per row is ``ceil(max(n - overlap, 1) / stride)``, so output
    size is linear in corpus tokens.
    """
    if overlap < 0 or overlap >= max_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens, got "
            f"overlap={overlap}, max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    n_tok = (
        _precomputed_counts(n_tok_col, "chunk_documents")
        if n_tok_col is not None
        else F.size(tokens(text_col)).cast("long")
    )
    n = F.greatest(n_tok, F.lit(1))
    # last chunk start s satisfies s = k*stride, s < n, and s + stride
    # >= n - overlap... simplest exact form: k_max = floor((n - 1 -
    # overlap) / stride) clamped at 0 — chunk k covers [k*stride,
    # min(n, k*stride + max_tokens)); k_max is the largest k whose
    # window begins before the doc's tail is already fully covered.
    k_max = F.greatest(
        ((n - 1 - F.lit(overlap)) / F.lit(stride)).cast("long"),
        F.lit(0),
    )
    d = docs.select(
        F.col(id_col),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), k_max)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * F.lit(stride)
    end = F.least(F.col("__n"), start + F.lit(max_tokens))
    return d.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        (end - start).cast("long").alias("n_tok"),
    )
