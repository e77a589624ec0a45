"""Deduplication operators for training-data pipelines.

Four families, each idiomatic-Spark and scale-shaped (SURVEY §7 step 6):

* **exact** — hash-groupBy on content digest; one shuffle on the digest,
  map-side partial aggregation. At 100 TB: digest is 16 bytes/row, the
  shuffle is tiny relative to the data.
* **n-gram Jaccard** — shingle sets + blocked self-join + array
  intersection. All-pairs is quadratic, so pairs are *blocked* (here by
  ``lang``; in production by LSH buckets — see minhash).
* **MinHash + LSH** — k independent hash minima per doc → band buckets →
  candidates join only within buckets. The linear-time scale path: one
  explode+groupBy for signatures, one groupBy for buckets, one self-join
  whose size is controlled by band width.
* **SimHash** — per-bit majority vote of token hashes → one 32-bit
  signature; near-dups differ in few bits (Hamming). One explode+groupBy.

All sketches use the md5-based :func:`...functions.scalars.hash32` so every
stage is bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.functions.scalars import hash32
from polymarket_data_ingestor_spark.operators.text import tokens

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne), classic Carter-Wegman


def exact_dedup_groups(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: md5 digest → (digest, keeper id, group size).

    Keeper = min id (deterministic). ``n_dupes > 1`` rows are duplicate
    groups; to materialize the deduped corpus, semi-join ids back.
    """
    return (
        df.select(F.md5(F.col(key_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def drop_exact_dupes(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialized exact dedup: keep the min-id row per content digest."""
    keep = exact_dedup_groups(df, key_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def word_ngrams(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a text column (array<string>)."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(grams)


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
    ``array_intersect``/``array_union`` (JVM, no UDF). ``block_col``
    restricts the self-join to equal blocking keys — without it this is
    all-pairs O(N²) and only usable on small corpora or post-LSH candidates.
    """
    grams = df.select(
        F.col(id_col), F.col(block_col) if block_col else F.lit(1).alias("__b"),
        word_ngrams(text_col, n).alias("grams"),
    )
    bcol = block_col if block_col else "__b"
    a = grams.alias("a")
    b = grams.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(
            b,
            (F.col(f"a.{bcol}") == F.col(f"b.{bcol}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_wide(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """Wide-form MinHash: one row per doc, columns ``__mh_0..__mh_{k-1}``.

    All k minima are computed in ONE aggregation over the exploded
    shingles — the shuffle carries (id, h) pairs with k tiny min buffers
    instead of k× exploded rows (k=16 ⇒ 16× fewer shuffle rows than the
    long-format-first plan). ``h_i(x) = (2i+1)*hash32(x) + i*b mod p``,
    the standard universal family; min is order-insensitive so the values
    are identical to any evaluation order.
    """
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, shingle_n)).alias("gram")
    )
    base = grams.select(id_col, hash32("gram").alias("h"))
    # long literals: i * 987654321 overflows int32 under ANSI mode
    b = F.lit(987_654_321).cast("long")
    mins = [
        F.min(
            ((F.lit(2 * i + 1).cast("long")) * F.col("h") + F.lit(i).cast("long") * b)
            % MINHASH_PRIME
        ).alias(f"__mh_{i}")
        for i in range(num_hashes)
    ]
    return base.groupBy(id_col).agg(*mins)


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
    """
    rows_per_band = num_hashes // bands
    # Band keys straight from the wide single-pass signatures: the key is
    # the ordered comma-join of the band's minima — no k× explode and no
    # second groupBy; one explode of `bands` small structs per doc.
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
    band_keys = wide.select(
        F.col(id_col), F.explode(band_structs).alias("bk")
    ).select(id_col, "bk.band", "bk.band_key")
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


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash: sign of the per-bit sum of token hash bits.

    ``bit_i = 1 if Σ_tokens (2*((hash32(tok)>>i)&1) - 1) > 0`` — near-dup
    docs land at small Hamming distance. Long-format per-bit aggregation
    (explode bits → sum votes → reassemble) keeps it SQL-reproducible.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).select(id_col, hash32("tok").alias("h"))
    votes = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).select(
        id_col,
        "bit",
        # dynamic shift amounts need expr(): F.shiftright only takes int
        (F.expr("shiftright(h, bit) & 1") * 2 - 1).alias("vote"),
    )
    bit_votes = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return bit_votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
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
