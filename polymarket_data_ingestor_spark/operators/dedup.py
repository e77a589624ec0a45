"""Deduplication operators for training-data pipelines.

Four families, each idiomatic-Spark and scale-shaped (SURVEY §7 step 6):

* **exact** — hash-groupBy on content digest; one shuffle on the digest,
  map-side partial aggregation. At 100 TB: digest is 16 bytes/row, the
  shuffle is tiny relative to the data.
* **n-gram Jaccard** — shingle sets + blocked self-join + array
  intersection. All-pairs is quadratic, so pairs are *blocked* (here by
  ``lang``; in production by LSH buckets — see minhash).
* **MinHash + LSH** — k independent hash minima per doc → band buckets →
  candidates join only within buckets. The linear-time scale path:
  signatures are a ZERO-shuffle Arrow-batched projection (a doc's
  signature depends only on its own text); the only shuffle is the
  band-bucket self-join, whose size is controlled by band width.
* **SimHash** — per-bit majority vote of token hashes → one 32-bit
  signature; near-dups differ in few bits (Hamming). Also a zero-shuffle
  Arrow projection.

All sketches hash with the md5-prefix scheme of
:func:`...functions.scalars.hash32` (Python twin: :func:`_h32`) so every
stage is bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import re
from hashlib import md5 as _md5

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from polymarket_data_ingestor_spark.operators.text import tokens

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne), classic Carter-Wegman

# Ship this module by value inside serialized plans (same rationale as
# operators/replay.py): the sketch kernels below close over module-level
# helpers, and executors must not need the package on their PYTHONPATH.
try:  # pragma: no cover - environment-dependent
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; PYTHONPATH fallback applies
    pass


# --- Arrow-batched text-sketch kernels --------------------------------------
#
# The interpreted higher-order functions (transform/slice/concat_ws under
# word_ngrams, split under tokens) were the slowest hot loop in the corpus
# sketches (minhash/simhash/jaccard). These Python kernels replicate the
# Catalyst expressions' semantics EXACTLY and run vectorized over Arrow
# batches instead — same strings, same 32-bit md5-prefix hashes, same
# int64 arithmetic, so every downstream value is bit-identical to both the
# Catalyst form and the DuckDB oracle SQL.

#: Java's ``\s`` is ASCII-only; Python's is Unicode-aware. Spark's
#: ``split(col, '\s+')`` uses the Java class, so match it literally.
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def _py_tokens(text: str) -> list[str]:
    """Exact replica of :func:`...operators.text.tokens`
    (``split(trim(col), '\\s+')``): Spark ``trim`` strips SPACES only
    (not tabs/newlines), and Java ``split`` with limit -1 keeps the
    empty tokens that edge whitespace produces."""
    return _JAVA_WS.split(text.strip(" "))


def _py_grams(toks: list[str], n: int) -> list[str]:
    """Exact replica of :func:`word_ngrams` BEFORE array_distinct:
    ``sequence(0, greatest(size-n, 0))`` then ``concat_ws(' ',
    slice(toks, i+1, n))`` — short docs yield one truncated shingle."""
    upper = max(len(toks) - n, 0)
    return [" ".join(toks[i : i + n]) for i in range(upper + 1)]


def _h32(s: str) -> int:
    """Python twin of :func:`...functions.scalars.hash32` (first 8 md5
    hex chars as int64) — identical in Spark, DuckDB, and here."""
    return int(_md5(s.encode("utf-8")).hexdigest()[:8], 16)


#: Bounded memo for the Arrow kernels' per-gram hashing (r14, guide
#: §4.2): gram streams are Zipfian, so most md5 calls recompute a hash
#: already seen — measured at sf0.1, the corpus featurization's 536k
#: gram instances hold only 962 DISTINCT grams, and the memoized kernel
#: loop runs 0.95 s → 0.25 s. Module-level so a reused Python worker
#: keeps it across tasks and queries; cleared at 2^20 entries to bound
#: per-worker memory (a 128 MB text split at 100 TB can see tens of
#: millions of distinct grams — an unbounded dict would hold GBs).
#: Values delegate to :func:`_h32` on miss, so equality is by
#: construction.
_H32_MEMO: dict[str, int] = {}
_H32_MEMO_CAP = 1 << 20

#: Memoize only SHORT grams (unigrams/bigrams/shingles up to this n).
#: Long positional windows (the substring family's 8-grams) are mostly
#: DISTINCT — measured at sf0.1: 224k distinct of 235k instances — so
#: the memo is all misses there: pure dict overhead plus up to ~100
#: bytes of retained key per gram (a worker-memory liability), with no
#: hit-rate to pay for it. Short grams are where Zipf bites (962
#: distinct of 536k instances) and keys are tens of bytes.
_MEMO_MAX_GRAM_N = 4


def _h32_cached(s: str) -> int:
    v = _H32_MEMO.get(s)
    if v is None:
        if len(_H32_MEMO) >= _H32_MEMO_CAP:
            _H32_MEMO.clear()
        v = _H32_MEMO[s] = _h32(s)
    return v


def _h63(s: str) -> int:
    """63-bit token hash: two independent salted 32-bit md5-prefix hashes
    packed as ``(h_a mod 2^31) * 2^32 + h_b``. Capping the high half at
    31 bits keeps the packed value strictly below 2^63, so it fits a
    signed int64 / DuckDB BIGINT with no unsigned-overflow trap (a full
    64-bit value would need unsigned semantics neither engine shares)."""
    return (_h32("a:" + s) % 2_147_483_648) * 4_294_967_296 + _h32("b:" + s)


#: Conf key: when "true", lineage cuts in this module use RELIABLE
#: checkpoints (``DataFrame.checkpoint`` into the directory set via
#: ``spark.sparkContext.setCheckpointDir``) instead of
#: ``localCheckpoint``. Default off: localCheckpoint is cheaper and
#: right for local mode / short jobs, but its blocks die with their
#: executor and the truncated lineage makes recompute IMPOSSIBLE — on
#: a long cluster run, flip this on and point the checkpoint dir at
#: durable storage (r14 judge note).
RELIABLE_CHECKPOINT_CONF = (
    "spark.polymarket_data_ingestor.reliableCheckpoint"
)


def _cut_lineage(df: DataFrame) -> DataFrame:
    """Lazy lineage cut: ``localCheckpoint`` by default, a RELIABLE
    ``checkpoint`` when :data:`RELIABLE_CHECKPOINT_CONF` is "true".

    Both are lazy — the first downstream action materializes the cut,
    so no extra Spark job either way. The reliable form requires the
    caller to have set ``spark.sparkContext.setCheckpointDir`` (Spark
    raises otherwise — deliberately loud: an opt-in to durability must
    not silently fall back to the volatile form)."""
    spark = df.sparkSession
    flag = str(
        spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false")
    ).lower()
    if flag == "true":
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def content_digest(key_col: str | Column) -> Column:
    """THE content digest every exact-dedup surface shares (batch
    groups, materializer, streaming digest lake + bloom front): md5 of
    the content, with NULL content mapped to the sentinel ``"null"``
    instead of a NULL hash. The sentinel matters: NULL never
    equi-joins NULL, so a raw ``md5`` silently drops every
    null-content row through the semi-join — with the sentinel they
    form one dedup group (keep-one) like any other content value, and
    the string can never collide with a real digest (md5 is 32 hex
    chars). Change the hash or the sentinel HERE only — five surfaces
    consume it (exact_dedup_groups, drop_exact_dupes, dedup_against,
    the streaming digest lake, the bootstrap seed), and the streaming
    bloom front additionally slices the digest for its hash positions
    (non-hex slices coalesce to position 0 there — see
    ``live._bloom_hash_cols``)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.coalesce(F.md5(c), F.lit("null"))


def exact_dedup_groups(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: md5 digest → (digest, keeper id, group size).

    Keeper = min id (deterministic). ``n_dupes > 1`` rows are duplicate
    groups; to materialize the deduped corpus, semi-join ids back.
    NULL content forms one group under the ``"null"`` sentinel digest
    (see :func:`content_digest`).
    """
    return (
        df.select(
            content_digest(key_col).alias("content_hash"), F.col(id_col)
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def drop_exact_dupes(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialized exact dedup: keep ONE min-id row per content digest.

    ONE corpus scan, ONE exchange: ``row_number()`` over
    ``Window.partitionBy(digest).orderBy(id NULLS LAST)`` ranks every
    row of a dedup group; the keeper is rank 1 (the min non-null id —
    ties on (digest, id), i.e. at-least-once redelivery copies or
    same-id variants, keep one arbitrary-but-single survivor, the old
    ``dropDuplicates`` semantics). The previous agg-then-semi-join
    shape re-derived the corpus subtree once per branch (3 scans after
    the NULL-passthrough fix — the r13 scan-budget regression); the
    window reads it once. Skew note for 100 TB: a megadup group (one
    content value repeated billions of times) lands on a single
    reducer's external sort either way — the semi-join variant also
    exchanges on the digest — and AQE's skew handling does not split
    window partitions, so pathological boilerplate should be routed
    through :func:`remove_boilerplate_lines` first.

    NULL-id rows bypass the dedup entirely: with no usable identity
    they cannot participate in keep-one semantics — they pass through
    unchanged (review finding: min() skips NULLs and a semi-join key
    never matches NULL, so they previously VANISHED). NULLS LAST in
    the ranking keeps them from ever shadowing a real keeper; the
    keep predicate exempts them by ``id IS NULL``.
    NULL content keeps its min-id row like any other group
    (:func:`content_digest`'s sentinel — a raw md5 would NULL the
    group key and make every null-content document its own group).
    """
    w = (
        Window.partitionBy("__digest")
        .orderBy(F.col(id_col).asc_nulls_last())
    )
    return (
        df.withColumn("__digest", content_digest(key_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col(id_col).isNull() | (F.col("__rn") == 1))
        .drop("__digest", "__rn")
    )


def dup_size_histogram(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplication profile of a corpus: how many content groups exist at
    each duplication level, and how many documents they hold — the
    one-page answer to "how duplicated is this crawl?" that drives the
    dedup-strategy decision (a long tail of pairs wants MinHash; a few
    megaclusters want the boilerplate path).

    Output: ``(n_dupes, n_groups, n_docs, doc_share)`` — one row per
    group size, ``n_docs = n_dupes * n_groups``, ``doc_share`` of the
    corpus. ``n_dupes = 1`` is the unique mass.

    Scale shape: the digest rollup (one shuffle of 16-byte digests,
    map-side combined) followed by a tiny second aggregate over group
    SIZES (cardinality = distinct duplication levels, dozens at any
    corpus size) and a broadcast 1-row total for the share.
    """
    groups = exact_dedup_groups(df, key_col, id_col).select("n_dupes")
    hist = groups.groupBy("n_dupes").agg(
        F.count(F.lit(1)).alias("n_groups")
    )
    total = hist.agg(
        F.sum(F.col("n_dupes") * F.col("n_groups")).alias("__total")
    )
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "n_dupes",
            "n_groups",
            (F.col("n_dupes") * F.col("n_groups")).alias("n_docs"),
            (
                (F.col("n_dupes") * F.col("n_groups")).cast("double")
                / F.col("__total")
            ).alias("doc_share"),
        )
    )


def word_ngrams(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    Pure-Catalyst reference form; the hot paths use
    :func:`word_ngrams_vectorized`, whose output is asserted identical
    in tests.
    """
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(grams)


def word_ngrams_vectorized(text_col: F.Column | str, n: int = 3) -> F.Column:
    """Arrow-batched twin of :func:`word_ngrams`: identical strings in
    identical (first-occurrence) order, built in a pandas kernel instead
    of interpreted transform/slice/concat_ws HOFs (~the cost of the scan
    instead of dominating it)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    @pandas_udf("array<string>")
    def grams(texts: pd.Series) -> pd.Series:
        # NULL text → [""]: in the Catalyst form size(NULL toks) = -1 →
        # one index, and concat_ws over the NULL slice yields "" — the
        # expression never goes NULL. Replicated bit-for-bit.
        return pd.Series(
            [
                [""]
                if t is None
                else list(dict.fromkeys(_py_grams(_py_tokens(t), n)))
                for t in texts
            ]
        )

    return grams(c)


def gram_hashes_vectorized(
    text_col: F.Column | str, n: int = 3
) -> F.Column:
    """Distinct word-n-gram 32-bit hashes (array<long>), hashed INSIDE
    the Arrow kernel.

    Equivalent to ``hash32(explode(word_ngrams_vectorized(...)))`` with
    empty grams dropped, but the Arrow batch carries one int64 per
    n-gram instead of the n-token string — for n=8 that is ~an order of
    magnitude less transfer and no per-gram JVM md5 — which matters
    when the gram stream is the dominant data volume
    (:func:`substring_dup_pairs`). Hash scheme is :func:`_h32`, the
    exact Python twin of the JVM/DuckDB ``hash32``, so downstream
    values are unchanged. Empty grams ('' — produced only by NULL/empty
    text) are dropped in-kernel: the string form filters them after
    explode, same result.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    h = _h32_cached if n <= _MEMO_MAX_GRAM_N else _h32

    @pandas_udf("array<long>")
    def gram_hashes(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                []
                if t is None
                else [
                    h(g)
                    for g in dict.fromkeys(_py_grams(_py_tokens(t), n))
                    if g != ""
                ]
                for t in texts
            ]
        )

    return gram_hashes(c)


def gram_hashes_positional(
    text_col: F.Column | str, n: int = 8
) -> F.Column:
    """Per-POSITION word-n-gram hashes (array<long>): element i is the
    32-bit hash of the window starting at token i — the alignment
    :func:`substring_trim_docs` needs to excise token RANGES, which
    the distinct-set form (:func:`gram_hashes_vectorized`) destroys.
    Same Arrow-kernel shape and the same :func:`_h32` hash family
    (bit-identical to JVM/DuckDB ``hash32``); the sentinel ``''`` gram
    (blank/NULL text) becomes a NULL element instead of being dropped,
    preserving index == token position. NULL text → empty array."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    h = _h32_cached if n <= _MEMO_MAX_GRAM_N else _h32

    @pandas_udf("array<long>")
    def gram_hashes_pos(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                []
                if t is None
                else [
                    h(g) if g != "" else None
                    for g in _py_grams(_py_tokens(t), n)
                ]
                for t in texts
            ]
        )

    return gram_hashes_pos(c)


def substring_trim_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Excise duplicated k-token SPANS and keep the documents — the
    higher-yield curation action the Lee-et-al. exact-substring recipe
    actually prescribes (:func:`substring_dup_pairs`'s materializer
    drops whole cluster members; a 95%-unique doc carrying one pasted
    license block should lose the block, not the doc).

    Policy (deterministic, oracle-expressible): a k-token window is
    DUPLICATED when its hash occurs >= 2 times corpus-wide, counting
    every position — so verbatim intra-document repetition is caught
    too, not just cross-document paste. Exactly ONE copy survives: the
    globally-first occurrence (min (id, position)) of each duplicated
    window is exempt, every other occurrence has its k tokens removed
    (Lee et al. keep one copy so the corpus retains the information
    once). Overlapping duplicated windows union their ranges; an
    exempt window's tokens can still fall to a DIFFERENT overlapping
    duplicated window — span-level union is inherently gram-granular.
    Untouched documents keep their ORIGINAL text byte-for-byte
    (including NULL); edited documents are re-joined with single
    spaces from the surviving tokens in order (token-level surgery
    cannot preserve inter-token whitespace). Output: (id,
    trimmed_text, n_tokens, n_removed), one row per input document.

    Scale shape (100 TB): one Arrow-kernel corpus pass emits the
    positional gram stream as int64 (never gram strings); ONE
    anchored exchange on the gram hash feeds both the occurrence
    aggregate and the join-back via AQE stage reuse (the
    :func:`substring_dup_pairs` anchor trick); duplicated windows —
    a corpus-duplication-sized set, not corpus-sized — explode into k
    covered positions; the only full-token shuffle is the final
    regroup-by-doc, inherent to rewriting documents (same bound as
    :func:`remove_boilerplate_lines`). No self-join anywhere: trim is
    LINEAR where pairing is quadratic — no hot-window cap needed.
    """
    grams = (
        df
        # NULL ids are unkeyable (and ignored, the monoid convention).
        # Filtering HERE — not relying on join pushdown — matters for
        # the plan: the excised join pushes isnotnull(id) below the
        # kernel on its side only, making the two repartition subtrees
        # canonically unequal, and AQE then materializes the gram
        # shuffle TWICE (the kernel corpus pass with it)
        .filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(gram_hashes_positional(text_col, k)).alias(
                "__pos", "__gh"
            ),
        )
        .filter(F.col("__gh").isNotNull())
        .repartition("__gh")
    )
    stats = grams.groupBy("__gh").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct(F.col(id_col).alias("d"),
                       F.col("__pos").alias("p"))).alias("__first"),
    )
    excised = (
        grams.join(stats.filter(F.col("__cnt") >= 2), "__gh")
        .filter(
            ~(
                (F.col(id_col) == F.col("__first.d"))
                & (F.col("__pos") == F.col("__first.p"))
            )
        )
    )
    covered = excised.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("__pos"), F.col("__pos") + F.lit(k - 1))
        ).alias("__tpos"),
    ).distinct()
    tstream = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("__tpos", "__tok"),
    )
    rebuilt = (
        tstream.join(covered, [id_col, "__tpos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__tpos", "__tok"))
            ).alias("__ts")
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.expr("transform(__ts, x -> x.__tok)"), " "
            ).alias("__trimmed"),
            F.size("__ts").cast("long").alias("__n_kept"),
        )
    )
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(tokens(text_col)))
        .cast("long")
        .alias("n_tokens"),
    )
    n_kept = F.coalesce(F.col("__n_kept"), F.lit(0))
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        # NULL-id rows never joined `rebuilt` (they are unkeyable), so
        # the old coalesce emitted '' — silently DESTROYING their text
        # (review finding, reproduced). They pass through verbatim.
        F.when(
            F.col(id_col).isNull() | (n_kept == F.col("n_tokens")),
            F.col(text_col),
        )
        .otherwise(F.coalesce(F.col("__trimmed"), F.lit("")))
        .alias("trimmed_text"),
        F.col("n_tokens"),
        F.when(F.col(id_col).isNull(), F.lit(0))
        .otherwise(F.col("n_tokens") - n_kept)
        .cast("long")
        .alias("n_removed"),
    )


def _blocked_gram_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    block_col: str | None,
):
    """Shared scaffold for the gram-overlap pair operators: per-doc
    distinct shingles with blank grams REMOVED — not just the ``""``
    sentinel but any whitespace-only shingle: ``trim`` strips spaces
    only, so a tab/newline-only doc shingles to ``" "`` and the old
    ``array_remove(grams, "")`` kept it, pairing every pair of
    whitespace-only scrape artifacts at 100% similarity — the
    quadratic junk explosion this guard exists to contain (review
    finding, reproduced). Then the block-equal ``id <`` self-join.
    Returns (joined, block column name) with sides aliased
    ``a``/``b``."""
    grams = df.select(
        F.col(id_col),
        F.col(block_col) if block_col else F.lit(1).alias("__b"),
        F.filter(
            word_ngrams_vectorized(text_col, n),
            lambda g: F.trim(g) != "",
        ).alias("grams"),
    )
    bcol = block_col if block_col else "__b"
    a = grams.alias("a")
    b = grams.alias("b")
    joined = a.join(
        b,
        (F.col(f"a.{bcol}") == F.col(f"b.{bcol}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return joined


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.12,
    block_col: str | None = None,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard similarity.

    Jaccard = |A∩B| / |A∪B| over distinct shingles, computed with
    ``array_intersect``/``array_union`` (JVM, no UDF). Blank/NULL-text
    docs have no shingles and never pair (see
    :func:`_blocked_gram_self_join`). ``block_col`` restricts the
    self-join to equal blocking keys — without it this is all-pairs
    O(N²) and only usable on small corpora or post-LSH candidates.
    """
    joined = _blocked_gram_self_join(df, text_col, id_col, n, block_col)
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    # blank-doc pairs have union 0 — guard the division (ANSI mode
    # throws DIVIDE_BY_ZERO before the threshold filter could prune)
    jac = F.when(
        union > 0, inter.cast("double") / union.cast("double")
    )
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """Near-dup pairs by ASYMMETRIC n-gram containment:
    ``containment(A in B) = |A∩B| / |A|`` — the quote/subset modality
    Jaccard misses. A short document fully embedded in a long one
    (quoted post, boilerplate-wrapped article, excerpt) has tiny
    Jaccard (the union is dominated by the long side) but containment
    ≈ 1 from the short side. Dedup pipelines drop the CONTAINED doc
    and keep the superset.

    Output: one row per ordered detection ``(id_small, id_big,
    containment, n_grams_small, n_grams_big)`` where ``id_small``'s
    grams are ≥ ``threshold`` covered by ``id_big``'s. Both directions
    are tested per pair; a near-exact duplicate appears once with the
    smaller gram set (ties by id) as ``id_small``.

    Scale shape: same blocked self-join as :func:`ngram_jaccard_pairs`
    (shared scaffold — the sentinel ``""`` gram is removed, so
    blank/NULL-text docs never pair); the intersection is
    ``array_intersect`` on distinct shingles, JVM-side. Unblocked use
    is for small corpora / verification stages only.
    """
    joined = _blocked_gram_self_join(df, text_col, id_col, n, block_col)
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    na = F.size(F.col("a.grams"))
    nb = F.size(F.col("b.grams"))
    # the smaller gram set (ties by id) is the candidate contained side
    a_small = (na < nb) | ((na == nb) & (F.col(f"a.{id_col}")
                                         < F.col(f"b.{id_col}")))
    small_id = F.when(a_small, F.col(f"a.{id_col}")).otherwise(
        F.col(f"b.{id_col}")
    )
    big_id = F.when(a_small, F.col(f"b.{id_col}")).otherwise(
        F.col(f"a.{id_col}")
    )
    n_small = F.least(na, nb)
    n_big = F.greatest(na, nb)
    # n_small can be 0 for blank docs — ANSI mode would throw on the
    # division before the output filter prunes those pairs
    cont = F.when(
        n_small > 0, inter.cast("double") / n_small.cast("double")
    )
    return (
        joined.select(
            small_id.alias("id_small"),
            big_id.alias("id_big"),
            F.round(cont, 6).alias("containment"),
            n_small.alias("n_grams_small"),
            n_big.alias("n_grams_big"),
        )
        # n_grams_small > 0 is live now: blank/NULL docs have EMPTY gram
        # sets after the sentinel removal and must not divide (or pair)
        .filter(
            (F.col("containment") >= threshold)
            & (F.col("n_grams_small") > 0)
        )
    )


def _minhash_wide(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """Wide-form MinHash: one row per doc, columns ``__mh_0..__mh_{k-1}``.

    ZERO-shuffle: a document's signature depends only on its own text, so
    the whole thing is one Arrow-batched pandas-UDF projection — no
    explode, no groupBy (the r2 version shuffled (id, h) pairs into a
    16-buffer min aggregation; this removes that shuffle entirely, the
    dominant win at 100 TB where the shingle stream is ~100× the corpus).
    ``h_i(x) = (2i+1)*hash32(x) + i*b mod p``, the standard universal
    family, evaluated in int64 numpy — bit-identical to the Catalyst/
    DuckDB long arithmetic ((2i+1)·h < 2^38, no overflow). A NULL text
    hashes as the single empty shingle [""] — exactly what the Catalyst
    word_ngrams form produces for NULL (concat_ws never yields NULL).
    """
    ii = np.arange(num_hashes, dtype=np.int64)
    mul = 2 * ii + 1
    # i * 987654321 overflows int32; keep the int64 form the SQL uses
    add = ii * np.int64(987_654_321)
    n = shingle_n
    hfn = _h32_cached if n <= _MEMO_MAX_GRAM_N else _h32

    @pandas_udf("array<bigint>")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            # distinct is free here (set) and min is insensitive to it;
            # NULL text hashes as the single empty shingle, like the
            # Catalyst word_ngrams form
            hs = (
                {_h32("")}
                if t is None
                else {hfn(g) for g in _py_grams(_py_tokens(t), n)}
            )
            h = np.fromiter(hs, dtype=np.int64, count=len(hs))
            out.append(
                ((mul[:, None] * h[None, :] + add[:, None]) % MINHASH_PRIME)
                .min(axis=1)
            )
        return pd.Series(out)
    return df.select(F.col(id_col), sig(F.col(text_col)).alias("__sig")).select(
        id_col,
        *[F.col("__sig")[i].alias(f"__mh_{i}") for i in range(num_hashes)],
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures in long format: (id, hash_idx, minhash).

    ``h_i(x) = (a_i * hash32(x) + b_i) mod p`` with fixed odd ``a_i``,
    ``b_i`` derived from ``i`` — the standard universal-hash family, fully
    deterministic. Long format keeps every stage SQL-expressible (the
    DuckDB oracle reproduces it exactly); internally the minima come from
    the single-pass wide aggregation (:func:`_minhash_wide`) and are
    unpivoted — one shuffle of (id, h) pairs, never k× exploded rows.
    """
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
    pairs = ", ".join(
        f"CAST({i} AS BIGINT), __mh_{i}" for i in range(num_hashes)
    )
    return wide.selectExpr(
        id_col,
        f"stack({num_hashes}, {pairs}) AS (hash_idx, minhash)",
    )


def _band_keys(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(id, band, band_key) rows from the wide single-pass signatures.

    The key is the ordered comma-join of the band's minima — no k×
    explode and no second groupBy; one explode of ``bands`` small
    structs per doc. Shared by the self-join pair finder and the
    cross-corpus incremental dedup.
    """
    rows_per_band = num_hashes // bands
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_n)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).cast("long").alias("band"),
            F.concat_ws(",", *[
                F.col(f"__mh_{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ]).alias("band_key"),
        )
        for b in range(bands)
    ])
    return wide.select(
        F.col(id_col), F.explode(band_structs).alias("bk")
    ).select(id_col, "bk.band", "bk.band_key")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 identical band of the signature.

    Bands of r = num_hashes/bands rows; band key = md5 of the ordered
    minhash concat. Self-join happens *within band buckets only* — the
    linear-ish scale path for corpus-level near-dedup. Candidates should be
    confirmed with :func:`ngram_jaccard_pairs` on the candidate set.

    ``num_hashes`` must divide evenly into ``bands``: a silent remainder
    would drop the trailing minima from every band key and lower recall.

    The band-key table is lazily ``localCheckpoint``-ed before the
    self-join: without it each join side re-derives the whole
    signature subtree — two full corpus scans and two runs of the
    tokenize+shingle+minhash Arrow kernel for one logical pass (r14
    measurement: 2.22 s → 1.30 s at sf0.1, and at 100 TB the second
    featurize pass is the single most expensive node in the plan).
    The checkpointed rows are (id, band, band_key) — ~bands small
    fields per doc, far cheaper to hold than to recompute; lazy, so
    the first downstream action materializes it (no extra job). Same
    no-recompute-on-executor-loss trade as the state-pair scaffold —
    unless :data:`RELIABLE_CHECKPOINT_CONF` is set, which swaps in a
    reliable ``checkpoint`` against the session's checkpoint dir for
    long cluster runs (r15; default behavior and plans unchanged).
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}); trailing hash minima would otherwise be "
            "silently excluded from the band keys"
        )
    band_keys = _cut_lineage(
        _band_keys(df, text_col, id_col, num_hashes, bands, shingle_n)
    )
    a = band_keys.alias("a")
    b = band_keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def drop_near_dupes(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Materialize near-dedup: drop the higher-id document of every
    near-dup pair (columns ``id_a < id_b``; e.g. from
    :func:`minhash_lsh_pairs` or :func:`...similarity.embedding_dup_pairs`).

    The greedy min-id-keeper convention (SlimPajama-style): one anti-join,
    no transitive closure — for a chain A~B, B~C with A≁C, both A and C
    survive. Deterministic: survivors depend only on the pair set, not on
    evaluation order. The anti-join shuffles only the distinct loser-id
    column, not the corpus (ids are broadcast when small enough).
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash: sign of the per-bit sum of token hash bits.

    ``bit_i = 1 if Σ_tokens (2*((hash32(tok)>>i)&1) - 1) > 0`` — near-dup
    docs land at small Hamming distance. A signature depends only on its
    own document, so this is ONE Arrow-batched projection: no bit
    explode, no shuffle (the r2 plan exploded tokens × 32 bit-vote rows
    through two groupBys — a 32× row multiplier through the shuffle).
    Token hashes keep duplicate occurrences (votes are per occurrence,
    not per distinct token), matching the explode-based form and the
    oracle SQL bit-for-bit: identical md5-prefix hashes, identical int64
    shifts/sums. NULL-text docs produce no row, like the explode plan.

    ``bits`` up to 32 uses the 32-bit md5-prefix hash; 33..63 switches to
    the packed two-hash :func:`_h63` so every bit position carries real
    entropy (a 32-bit hash under a 64-bit signature would leave the high
    bits constant-zero and silently halve discrimination).
    """
    if not 1 <= bits <= 63:
        raise ValueError("bits must be in 1..63 (int64/BIGINT-safe)")
    hfn = _h32 if bits <= 32 else _h63
    shifts = np.arange(bits, dtype=np.int64)

    @pandas_udf("bigint")
    def sig(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for j, t in enumerate(texts):
            hs = np.fromiter(
                (hfn(tok) for tok in _py_tokens(t)), dtype=np.int64
            )
            votes = (2 * ((hs[:, None] >> shifts[None, :]) & 1) - 1).sum(
                axis=0
            )
            out[j] = ((votes > 0).astype(np.int64) << shifts).sum()
        return pd.Series(out)

    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), sig(F.col(text_col)).alias("simhash")
    )


def hamming_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    max_distance: int = 3,
    bits: int = 32,
    all_pairs: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance (≤ max_distance).

    Default path is **banded and exact**: split the ``bits``-bit signature
    into ``max_distance + 1`` disjoint bands — by pigeonhole, any pair
    within Hamming distance d differs in at most d bands, so it matches
    *exactly* on at least one band. Candidates are the within-band-bucket
    self-join; the ``bit_count(xor)`` verify then yields precisely the
    all-pairs answer (full equality, not approximate recall) with a
    linear-ish candidate stage instead of O(N²).

    ``all_pairs=True`` is the quadratic escape hatch (signatures are
    8 bytes/doc so it survives longer than vector all-pairs, but it is
    still O(N²)).
    """
    if all_pairs:
        a, b = sig.alias("a"), sig.alias("b")
        xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
        dist = F.bit_count(xor)
        return (
            a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                dist.cast("long").alias("hamming"),
            )
            .filter(F.col("hamming") <= max_distance)
        )
    if max_distance + 1 > bits:
        # bits // n_bands would be 0 for some bands: an all-zero band
        # key puts EVERY signature in one bucket and the candidate join
        # silently goes quadratic. A distance bound >= bits is also
        # vacuous (every pair of b-bit signatures is within b).
        raise ValueError(
            f"hamming_pairs: max_distance ({max_distance}) must be < "
            f"bits ({bits}) — the banded path would degenerate to an "
            f"all-pairs join; use all_pairs=True if that is intended"
        )
    n_bands = max_distance + 1
    band_exprs = []
    lo = 0
    for i in range(n_bands):
        w = bits // n_bands + (1 if i < bits % n_bands else 0)
        mask = (1 << w) - 1
        band_exprs.append(
            F.expr(f"shiftright(simhash, {lo}) & {mask}").cast("long")
        )
        lo += w
    keys = sig.select(
        F.col(id_col), F.posexplode(F.array(*band_exprs)).alias("band", "key")
    ).withColumn("band", F.col("band").cast("long"))
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"),
                    F.col("simhash").alias("__sa"))
    sb = sig.select(F.col(id_col).alias("id_b"),
                    F.col("simhash").alias("__sb"))
    dist = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", dist.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
    )


def benchmark_ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.05,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per-doc n-gram overlap with a held-out set.

    Standard pre-training hygiene — any corpus document sharing shingle
    content with an evaluation/benchmark set is flagged (``contaminated``)
    so it can be dropped before training. Overlap = fraction of the doc's
    DISTINCT word n-grams that appear anywhere in the benchmark.

    100 TB shape: the benchmark side is tiny by construction (an eval set,
    not a corpus), so its distinct-gram set BROADCASTS; the corpus is
    scanned once — shingle (Arrow kernel), explode, broadcast-hash-join
    (no corpus shuffle), then a (doc_id, count) rollup whose map-side
    partials make the single shuffle negligible. If the "benchmark" is
    itself corpus-scale (corpus-vs-corpus audits), set
    ``broadcast_bench=False`` to let the gram join shuffle-partition
    both sides instead of materializing the gram set on every executor.
    """
    grams = docs.select(
        F.col(id_col),
        word_ngrams_vectorized(text_col, n).alias("__grams"),
    ).select(
        id_col, F.size("__grams").cast("long").alias("n_grams"), "__grams"
    )
    bench = (
        benchmark.select(
            F.explode(word_ngrams_vectorized(text_col, n)).alias("gram")
        )
        # a blank/NULL benchmark row shingles to [""]: unfiltered, that
        # sentinel gram marks every blank CORPUS doc 100% contaminated
        # (review finding); whitespace-only shingles filtered for the
        # same reason as _blocked_gram_self_join
        .filter(F.trim(F.col("gram")) != "")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    contamination = F.round(
        F.col("n_hits").cast("double") / F.col("n_grams").cast("double"), 6
    )
    bench_side = F.broadcast(bench) if broadcast_bench else bench
    return (
        grams.select(id_col, "n_grams", F.explode("__grams").alias("gram"))
        .join(bench_side, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            contamination.alias("contamination"),
        )
        .withColumn("contaminated", F.col("contamination") >= threshold)
    )


def dup_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive duplicate clusters: min-label connected components.

    After any pair generator (LSH bands, Hamming buckets, embedding LSH)
    the keeper decision must be TRANSITIVE — a~b and b~c put all three in
    one cluster even when (a, c) never surfaced as a pair (the gap
    ``drop_near_dupes``'s deliberately-greedy pair-local keeper leaves
    open). Every node starts labeled with its own id; labels flow min-wise
    along edges to a fixed point, mapping each node to the smallest id
    reachable from it — one ``component`` per dup cluster.

    Scale shape: standard iterative CC on DataFrames. Each round is one
    join + one min-agg, both hash-partitioned on the same key, with
    lineage truncated per round by an eager ``localCheckpoint`` (swap for
    ``checkpoint()`` where fault tolerance matters). Rounds = component
    diameter; dup graphs are near-stars and converge in 2-3. Labels only
    ever decrease (a semilattice), so convergence is detected by the label
    SUM going stationary — a 1-row agg per round, not a diff join.

    Exhausting ``max_iter`` without a fixed point raises RuntimeError:
    the labels would be silently wrong (a long chain's far end not yet
    relabeled to the component min). Hitting it means the pair graph has
    a path longer than ``max_iter`` — raise ``max_iter`` (rounds needed =
    component diameter) or pre-split the input.

    A NULL id on either side of a pair raises loudly: the engine's pair
    generators can never emit one (they join on id equality), so a NULL
    here means a corrupt hand-fed pair list — and unguarded it would
    emit a garbage ``(doc_id=NULL, component=<neighbor's label>)`` row
    while silently NOT connecting the NULL edge's endpoints (NULL never
    equi-joins), the silent-loss class the pack_sequences/asof reviews
    closed. The guard rides the cast expression itself so no pushed
    filter can prune the row before it evaluates.
    """
    def _ids_or_raise(col: str) -> F.Column:
        return F.when(
            F.col(col).isNotNull(), F.col(col).cast("long")
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"dup_components: NULL id in column '{col}' — a "
                    "NULL id cannot identify a document; filter or "
                    "repair the pair/node source upstream"
                )
            )
        )

    sym = pairs.select(
        _ids_or_raise(id_a).alias("u"),
        _ids_or_raise(id_b).alias("v"),
    )
    # Materialize the edge list ONCE: `pairs` usually carries a whole
    # detector subplan (LSH band join, substring gram shuffle, Hamming
    # blocks) and every CC round joins against `edges` — without the
    # materialization each round would re-run the full detector (measured
    # ~2x the materializer's cost at 2-3 rounds; unbounded at scale).
    # Storage is O(pairs), far below corpus size. persist + count (NOT
    # localCheckpoint): both run the detector exactly once, but persist
    # keeps the lineage, so a lost executor / dynamic-allocation
    # scale-down mid-CC recomputes the lost blocks instead of failing
    # the job (localCheckpoint'd blocks have no recovery path). The
    # per-round label checkpoint below is a different trade: there the
    # POINT is truncating the iterative lineage.
    from pyspark import StorageLevel

    edges = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    if nodes is None:
        nodes = edges.select(F.col("u").alias(id_col)).distinct()
        node_id = F.col(id_col).cast("long")  # already guarded via sym
    else:
        node_id = _ids_or_raise(id_col)  # hand-fed node list: same rule
    labels = nodes.select(
        node_id.alias("u"),
        node_id.alias("comp"),
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        nbr = edges.join(
            labels.select(F.col("u").alias("v"), "comp"), "v"
        ).select("u", "comp")
        # lazy localCheckpoint (r14 optimization round): the round's
        # convergence sum below is the round's first action, so it
        # materializes the checkpoint as a side effect — one Spark job
        # per round instead of two (eager checkpoint + sum). The
        # checkpoint boundary sits below the sum's plan, so the cached
        # blocks hold the full label rows, not a column-pruned view.
        labels = _cut_lineage(
            labels.union(nbr).groupBy("u").agg(F.min("comp").alias("comp"))
        )
        # decimal sum: an int64 sum of 63-bit-scale labels (hash- or
        # snowflake-derived ids) overflows — ANSI mode throws
        # ARITHMETIC_OVERFLOW on round one, non-ANSI could wrap to a
        # spuriously matching total and declare convergence early
        # (review finding, reproduced live)
        s = labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).collect()[0][0]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    # The returned labels are eagerly checkpointed, so the edge blocks
    # are no longer referenced — release executor storage now.
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dup_components did not reach a fixed point in {max_iter} "
            "iterations — labels are not yet transitive closures. The "
            "pair graph contains a component with diameter > max_iter; "
            "raise max_iter."
        )
    return labels.select(
        F.col("u").alias(id_col), F.col("comp").alias("component")
    )


def drop_dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Materialized TRANSITIVE near-dedup: keep one doc per dup cluster.

    Runs :func:`dup_components` over the pair graph and keeps exactly the
    rows that are their own cluster label (the min id of each connected
    component) — so a chain a~b~c keeps only ``a``, unlike the pair-local
    greedy keeper in :func:`drop_near_dupes` which cannot see that ``c``
    transitively duplicates ``a``. One keep-flag join back to the corpus.

    NULL-id rows pass through unchanged: with no usable identity they
    cannot appear in any pair, and a semi-join key never matches NULL —
    the old left-semi silently DROPPED them while the sibling
    materializers (:func:`drop_exact_dupes`, :func:`drop_near_dupes`)
    pass them through (review finding, reproduced).
    """
    comp = dup_components(
        pairs,
        nodes=df.select(id_col).where(F.col(id_col).isNotNull()),
        id_a=id_a, id_b=id_b, id_col=id_col,
    )
    keep = (
        comp.filter(F.col(id_col) == F.col("component"))
        .select(id_col)
        .withColumn("__keep", F.lit(True))
    )
    return (
        df.join(keep, id_col, "left")
        .filter(F.col(id_col).isNull() | F.col("__keep").isNotNull())
        .drop("__keep")
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_boiler: bool = True,
) -> DataFrame:
    """Line-level boilerplate removal (CCNet/RefinedWeb-style line dedup).

    A line occurring in ``>= min_docs`` DISTINCT documents is boilerplate
    (copyright headers, nav menus, newsletter footers) and is stripped
    from every document; the survivors are re-joined in original order.
    Output: ``(id, clean_text, n_lines, n_removed)`` — one row per input
    doc, including docs whose every line was boilerplate (empty
    ``clean_text``).

    Scale shape (100 TB): the line-frequency aggregation shuffles 16-byte
    md5 digests with map-side partials — never the line text. The
    boilerplate set (lines above the threshold) is tiny by construction —
    frequent lines are few — so tagging is a **broadcast** left join
    against that digest set by default; ``broadcast_boiler=False`` is the
    shuffle-join escape hatch for corpora where even the frequent-line
    set outgrows the driver. The only full-text shuffle is the final
    regroup-by-doc, inherent to rewriting documents. The reassembly sorts
    each doc's surviving lines by position inside ``array_sort`` — a
    per-row O(k log k) expression, no window, no global sort.
    """
    # posexplode_OUTER: a NULL-text doc (split -> NULL array) emits ONE
    # (pos=NULL, line=NULL) sentinel row instead of vanishing from the
    # explode — the one-row-per-input-doc contract (review finding)
    # rides the SAME scan rather than a filter+union branch that would
    # re-derive the corpus subtree (the r13 scan-budget regression).
    # A NULL pos is unambiguous: real positions are 0..n-1, and split()
    # of a non-NULL string never yields NULL elements.
    # NULL id refuses LOUDLY (the pack_sequences convention): the
    # regroup-by-doc keys on the id, and groupBy puts every NULL key in
    # ONE group — two NULL-id docs would come back as a single row with
    # their lines INTERLEAVED (review finding, reproduced: 'a\nb' +
    # 'c\nd' merged to 'a\nc\nb\nd'). The raise rides the id expression
    # itself — the group key is always evaluated, so no pruning can
    # skip it.
    lines = docs.select(
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(F.lit(
                f"remove_boilerplate_lines: NULL {id_col} — the "
                "regroup-by-doc would merge every NULL-id document "
                "into one interleaved row; assign ids or filter "
                "upstream"
            )),
        ).otherwise(F.col(id_col)).alias(id_col),
        F.posexplode_outer(F.split(F.col(text_col), "\n", -1)).alias(
            "pos", "line"
        ),
    ).withColumn("line_md5", F.md5("line"))
    boiler = (
        lines.groupBy("line_md5")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(
            (F.col("n_docs") >= min_docs)
            # the NULL-line sentinel group is never boilerplate (and a
            # NULL key would never match the join anyway)
            & F.col("line_md5").isNotNull()
        )
        .select("line_md5")
        .withColumn("__boiler", F.lit(True))
    )
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    tagged = lines.join(boiler, "line_md5", "left").withColumn(
        "keep", F.col("__boiler").isNull()
    )
    packed = tagged.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "line", "keep"))
        ).alias("ls")
    )
    # a doc is the NULL-text sentinel iff its (single) packed row has a
    # NULL pos — it reports NULL clean_text and zero counts
    is_null_doc = F.col("ls")[0]["pos"].isNull()
    return packed.select(
        F.col(id_col),
        F.when(is_null_doc, F.lit(None).cast("string"))
        .otherwise(
            F.array_join(
                F.expr("transform(filter(ls, x -> x.keep), x -> x.line)"),
                "\n",
            )
        )
        .alias("clean_text"),
        F.when(is_null_doc, F.lit(0))
        .otherwise(F.expr("size(ls)"))
        .cast("long")
        .alias("n_lines"),
        F.when(is_null_doc, F.lit(0))
        .otherwise(F.expr("size(filter(ls, x -> NOT x.keep))"))
        .cast("long")
        .alias("n_removed"),
    )


def dedup_against(
    new: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental (ingestion-time) dedup: drop new docs that exactly or
    nearly duplicate the EXISTING corpus; return the surviving new rows.

    Two stages, both cross-corpus (never new×new — batch-internal dups
    are :func:`drop_exact_dupes` / :func:`drop_near_dupes`'s job):

    * **exact** — anti-join the new batch's md5 digests against the
      existing corpus's distinct digests.
    * **near** — MinHash band keys for both sides; a new doc matching
      ANY existing doc on any (band, band_key) bucket is dropped via
      left-semi → anti. Near-check runs only on exact survivors.

    Scale shape (100 TB corpus, small daily batches): the existing
    side's digests and band keys are signature artifacts you'd persist
    once and reuse per batch; both joins are hash-equi on short keys
    (16-byte digest / band string), so the corpus text is never
    shuffled. With a small new batch, its digest and band-key sides
    broadcast under AQE.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}); trailing hash minima would otherwise be "
            "silently excluded from the band keys"
        )
    ex_digests = existing.select(
        content_digest(text_col).alias("__ch")
    ).distinct()
    exact_surv = (
        new.withColumn("__ch", content_digest(text_col))
        .join(ex_digests, "__ch", "left_anti")
        .drop("__ch")
    )
    nb = _band_keys(
        exact_surv, text_col, id_col, num_hashes, bands, shingle_n
    )
    eb = _band_keys(
        existing, text_col, id_col, num_hashes, bands, shingle_n
    ).select("band", "band_key")
    near_hit_ids = (
        nb.join(eb, ["band", "band_key"], "left_semi")
        .select(id_col)
        .distinct()
    )
    return exact_surv.join(near_hit_ids, id_col, "left_anti")


def substring_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_shared: int = 1,
    max_gram_docs: int = 50,
) -> DataFrame:
    """Doc pairs sharing verbatim k-token windows — exact-substring
    duplication, the containment modality set-similarity misses.

    A 9-gram quote pasted into an otherwise-unrelated document moves
    whole-doc Jaccard/MinHash barely at all; this operator catches it:
    two docs pair when they share at least ``min_shared`` DISTINCT
    k-token contiguous windows (tokenizer and truncated-short-doc edge
    semantics identical to :func:`word_ngrams`). Output:
    (id_a, id_b, n_shared) with id_a < id_b.

    Windows with document frequency > ``max_gram_docs`` are excluded
    via a broadcast anti-join (the hot set is tiny by construction,
    same shape as :func:`line_dedup_clean`'s boilerplate set): a window
    in d documents contributes d^2/2 pairs, so unbounded hot windows
    (license headers, navigation chrome) turn the gram join quadratic —
    and corpus-wide boilerplate is :func:`line_dedup_clean`'s job, not
    pairwise dedup's. The cap is therefore the scale contract: per-gram
    fan-out is bounded by ``max_gram_docs``, keeping the self-join
    linear-ish in corpus size.

    Windows join on their 32-bit content hash (:func:`...scalars.hash32`,
    same function in the DuckDB oracle), so the shuffle carries int64
    keys, not k-token strings; a hash collision can add a spurious
    shared-window count (~N_grams^2 / 2^33 expected corpus-wide) —
    confirm candidates with :func:`ngram_jaccard_pairs` when exactness
    of the PAIR SET matters.
    """
    grams = (
        df.select(
            F.col(id_col),
            F.explode(gram_hashes_vectorized(text_col, k)).alias("__gh"),
        )
        # one explicit exchange on the join key anchors every consumer:
        # freq, both self-join sides, and the anti-join all read THIS
        # shuffle via AQE stage reuse, so the Arrow gram kernel runs
        # ONCE over the corpus (unanchored, each consumer re-extracts
        # grams — four corpus passes). The broadcast-anti and the pair
        # join then both ride the same hash layout with no further
        # exchange on the big side.
        .repartition("__gh")
    )
    freq = grams.groupBy("__gh").agg(F.count(F.lit(1)).alias("__df"))
    hot = freq.filter(F.col("__df") > max_gram_docs).select("__gh")
    keep = grams.join(F.broadcast(hot), "__gh", "left_anti")
    a, b = keep.alias("a"), keep.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__gh") == F.col("b.__gh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
