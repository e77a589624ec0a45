"""Similarity search over embedding columns (array<float>).

Two tiers (SURVEY §7 step 6):

* **Brute-force cosine top-k** — the exactness baseline. Dot products via
  ``F.zip_with`` + ``F.aggregate`` folds: JVM-side, sequential
  (deterministic order → reproducible floats), no UDF, no explode-join
  blowup. Queries are broadcast; the corpus is scanned once. At 100 TB this
  is one pass per query batch — linear, embarrassingly parallel.
* **LSH-bucketed (random hyperplane)** — the approximate scale path: b
  deterministic hyperplane sign bits → bucket key; candidates only join
  within a bucket (plus optional multi-probe). Recall measured against the
  brute-force baseline in tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: :func:`cosine_topk` collects its query side to the driver (bounded
#: batch by contract); above this many query rows it refuses and points
#: to the distributed LSH/IVF paths instead of silently OOMing.
COSINE_TOPK_MAX_QUERY_ROWS = 100_000


def _dot(a, b) -> F.Column:
    # explicit double casts before multiply: float32 inputs promoted the
    # same way in any engine → bit-reproducible sums (sequential fold)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    """L2 norm (JVM fold). Refuses a NON-FINITE norm loudly: a NaN/Inf
    component yields a NaN/Inf norm, and the resulting NaN cosine ranks
    FIRST in a desc window (Spark orders NaN above every double) — the
    same nondeterministic-garbage class as the zero-norm review finding,
    which ANSI's DIVIDE_BY_ZERO already catches at the division. The
    guard rides the norm expression itself so every JVM cosine path
    (lsh/ivf/dup_pairs/semdedup) inherits it; a NULL vector still
    yields a NULL norm (isnan(NULL) is NULL -> otherwise branch)."""
    n = F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return F.when(
        F.isnan(n) | (n == F.lit(float("inf"))),
        F.raise_error(
            F.lit(
                "cosine norm: non-finite vector norm — a NaN/Inf "
                "component poisons similarity scores, which rank "
                "nondeterministically; filter upstream (see "
                "quantize_embeddings' non-finite gate)"
            )
        ).cast("double"),
    ).otherwise(n)


def cosine(a, b) -> F.Column:
    """Cosine similarity of two array<numeric> columns (JVM fold, no UDF)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _py_seq_norm(vec) -> float:
    """Driver-side L2 norm, bit-identical to :func:`_norm`: plain
    sequential float64 adds in dimension order (NOT math.fsum — the
    engine fold is a naive left fold, and matching it exactly is the
    point), then one correctly-rounded sqrt."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _collect_query_probe(queries, query_id_col, vec_col, caller):
    """Collect a BOUNDED query batch to the driver (the codebook-style
    side every top-k path broadcasts as a closure). Fail loudly instead
    of silently collecting a huge side: ``limit(cap+1)`` bounds the
    probe itself, so even a billion-row query side costs one cheap scan,
    not a driver OOM. Shared by :func:`cosine_topk` and :func:`pq_topk`
    so the guard can never drift between them."""
    cap = COSINE_TOPK_MAX_QUERY_ROWS
    probe = queries.select(query_id_col, vec_col).limit(cap + 1).collect()
    if len(probe) > cap:
        raise ValueError(
            f"{caller} collects the query side to the driver; got more "
            f"than {cap} query rows. For an unbounded query side use "
            f"cosine_topk_lsh or ivf_topk instead."
        )
    return probe


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, embedding) — a bounded query batch by
    construction (collected to the driver like the IVF codebook in
    :func:`ivf_topk`); above ``COSINE_TOPK_MAX_QUERY_ROWS`` (100k) the
    collect refuses loudly — an unbounded query side belongs in the
    LSH/IVF paths. Ranking ties broken by neighbor id for determinism.
    Output: (query_id, vec_id, cos, rank).

    Two-level top-k — the scale path:

    1. **Per-partition k-best, zero shuffle**: one ``mapInPandas`` pass
       over the corpus scores every (query, vector) pair Arrow-batch-wise
       and keeps only each query's k best *within the partition* —
       bounded state (n_queries × k candidates per batch round), emits
       P × n_queries × k rows total. The old form shuffled the full
       N × n_queries cross product into ONE sort per query (a per-query
       full-corpus sort on a single executor — the 100 TB killer).
    2. **Merge**: a rank window over the P × k candidates per query —
       thousands of rows, not the corpus.

    Scores use dimension-ordered accumulation (the
    :func:`banded_hyperplane_keys` trick): float64 adds in index order,
    bit-identical to the sequential ``zip_with``/``aggregate`` fold of
    :func:`cosine` and to the DuckDB ``list_reduce`` oracle form. The
    in-kernel selection orders by ``np.round(cos, 6)`` while the final
    rank orders by JVM ``round(cos, 6)`` — the two can only disagree on
    a double whose shortest decimal form is an exact 1e-6 midpoint,
    which real-valued cosines do not hit.
    """
    from pyspark.sql import Window

    rows = _collect_query_probe(queries, query_id_col, vec_col,
                                "cosine_topk")
    # Zero-norm refusal, BOTH sides: the JVM cosine paths (lsh/ivf/
    # dup_pairs) already refuse zero norms loudly — ANSI mode turns
    # their 0-divisor into DIVIDE_BY_ZERO at execution — but numpy
    # silently yields NaN, and Spark ranks NaN FIRST in a desc window
    # (NaN > any double) while np.lexsort ranks it LAST: a zero-norm
    # vector surviving a sparse partition's local top-k would jump to
    # rank 1 in the merge (review finding, reproduced). Refuse like
    # the engine does instead of emitting order-dependent garbage.
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    id_t = emb.schema[id_col].dataType.simpleString()
    mid_schema = f"{query_id_col} {qid_t}, {id_col} {id_t}, __cos double"
    if not rows:
        return (
            emb.sparkSession.createDataFrame([], mid_schema)
            .select(
                query_id_col, id_col, F.col("__cos").alias("cos"),
                F.lit(0).cast("long").alias("rank"),
            )
            .limit(0)
        )
    qids = np.array([r[0] for r in rows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    nq, dim = Q.shape
    qn = np.zeros(nq)
    for p in range(dim):  # dimension order == fold order
        qn += Q[:, p] * Q[:, p]
    qn = np.sqrt(qn)
    # zero-norm OR non-finite (NaN/Inf component): both yield NaN
    # cosines, which Spark's desc window ranks FIRST while np.lexsort
    # ranks LAST — refuse rather than emit order-dependent garbage
    if np.any((qn == 0.0) | ~np.isfinite(qn)):
        bad = [q for q, n in zip(qids.tolist(), qn)
               if n == 0.0 or not np.isfinite(n)][:5]
        raise ValueError(
            f"cosine_topk: zero-norm or non-finite query vector(s) "
            f"{bad} — cosine is undefined; filter upstream"
        )

    def _partition_topk(batches):
        # per-query candidate pools, trimmed to k after every batch:
        # memory is O(n_queries * k), not O(partition)
        c_ids = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        c_cos = [np.empty(0) for _ in range(nq)]
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            ids = pdf[id_col].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            acc = np.zeros((len(V), nq))
            vn = np.zeros(len(V))
            for p in range(dim):  # dimension order == fold order
                acc += V[:, p : p + 1] * Q[None, :, p]
                vn += V[:, p] * V[:, p]
            bad_vn = (vn == 0.0) | ~np.isfinite(vn)
            if np.any(bad_vn):
                bad = ids[bad_vn][:5].tolist()
                raise ValueError(
                    f"cosine_topk: zero-norm or non-finite corpus "
                    f"vector(s) {bad} — cosine is undefined and NaN "
                    "scores rank nondeterministically; filter upstream "
                    "(the JVM paths refuse the same input via "
                    "DIVIDE_BY_ZERO / the _norm non-finite guard)"
                )
            cos = acc / (qn[None, :] * np.sqrt(vn)[:, None])
            for j in range(nq):
                mask = ids != qids[j]  # self-match excluded
                all_ids = np.concatenate([c_ids[j], ids[mask]])
                all_cos = np.concatenate([c_cos[j], cos[mask, j]])
                # selection key == final rank key: rounded cos desc, id asc
                order = np.lexsort((all_ids, -np.round(all_cos, 6)))[:k]
                c_ids[j], c_cos[j] = all_ids[order], all_cos[order]
        if seen:
            n_out = sum(len(c) for c in c_ids)
            if n_out:
                yield pd.DataFrame(
                    {
                        query_id_col: np.repeat(
                            qids, [len(c) for c in c_ids]
                        ),
                        id_col: np.concatenate(c_ids),
                        "__cos": np.concatenate(c_cos),
                    }
                )

    part = emb.select(id_col, vec_col).mapInPandas(
        _partition_topk, schema=mid_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round("__cos", 6).desc(), F.col(id_col)
    )
    return (
        part.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("__cos", 6).alias("cos"),
            "rank",
        )
    )


def _plane_component(plane_id: int, p: int) -> float:
    """Pseudo-random plane component in [-0.5, 0.5) from the md5-based
    hash32 — computed driver-side (planes are data-independent) but
    arithmetically IDENTICAL to the in-engine form
    ``(hash32(concat(plane_id, ':', p)) % 1000) / 1000.0 - 0.5`` that the
    DuckDB oracles reproduce, so bucket keys stay bit-exact across
    engines."""
    h = int(hashlib.md5(f"{plane_id}:{p}".encode()).hexdigest()[:8], 16)
    return (h % 1000) / 1000.0 - 0.5


def hyperplane_signs(
    vec_col: str, n_planes: int = 16, dim: int = 64, plane_offset: int = 0
) -> F.Column:
    """Deterministic random-hyperplane LSH bucket key (int64).

    Plane components are pseudo-random in [-0.5, 0.5] derived from
    ``hash32(plane:pos)`` — reproducible everywhere, no stored model.
    Bit j = sign of <v, plane_j>. ``plane_offset`` shifts the plane
    identities (not the bit weights) so banded schemes can draw
    independent plane sets per band.

    The planes are data-independent, so their components are baked in as
    literal arrays: per-row work is ``n_planes`` sequential-fold dot
    products (zip_with + aggregate, JVM-side), with zero hash calls in
    the hot path — at corpus scale this removes ~n_planes*dim md5
    evaluations per row while producing the exact same keys.
    """
    bits = []
    for j in range(n_planes):
        comps = F.array(*[
            F.lit(_plane_component(plane_offset + j, p)) for p in range(dim)
        ])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), comps, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(dot > 0, F.lit(1 << j).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return key


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    With b sign bits the corpus fans into 2^b buckets; the candidate join is
    bucket-equi instead of cross — the linear scale path. Recall < 1 by
    construction; raise with ``multiprobe`` or by lowering ``n_planes``.

    ``multiprobe=1`` additionally probes every bucket at Hamming
    distance 1 from the query's key (its ``n_planes`` single-bit flips
    — the planes a near-boundary vector most plausibly fell across).
    Probing multiplies only the tiny broadcast QUERY side (×(1+b)); the
    corpus is still hashed/scanned once, so recall rises steeply at
    almost no candidate cost versus halving ``n_planes`` (which doubles
    every bucket instead).
    """
    from pyspark.sql import Window

    e = emb.withColumn(
        "__bucket", hyperplane_signs(vec_col, n_planes, dim)
    ).withColumn("__vn", _norm(F.col(vec_col)))
    qkey = hyperplane_signs("__qvec", n_planes, dim)
    if multiprobe:
        probe_keys = F.array(
            qkey, *[qkey.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)]
        )
        bucket = F.explode(probe_keys).alias("__bucket")
    else:
        bucket = qkey.alias("__bucket")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            _norm(F.col(vec_col)).alias("__qn"),
        ).select("*", bucket)
    )
    # per-vector norms reused across pairs; op order identical to cosine()
    cos = _dot(F.col("__qvec"), F.col(vec_col)) / (
        F.col("__qn") * F.col("__vn")
    )
    scored = (
        e.join(q, "__bucket")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def fit_ivf_codebook(
    emb: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    fit_fraction: float = 0.25,
    seed: int = 42,
) -> list[list[float]]:
    """Train the IVF coarse-quantizer codebook on a deterministic sample.

    A coarse quantizer needs only enough points to place ``n_clusters``
    centroids — fitting MLlib KMeans on the FULL corpus would be a
    multi-pass training job over 100 TB before any search ran. The
    deterministic-seed ``.sample`` bounds the fit input to a fraction;
    the returned plain-list codebook is cheap to hold on the driver and
    reusable across :func:`ivf_topk` calls (fit once per corpus version,
    search many times).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_df = (
        emb
        if fit_fraction >= 1.0
        else emb.sample(fraction=fit_fraction, seed=seed)
    )
    ml = fit_df.withColumn("__features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="__features",
        predictionCol="__cluster",
    ).fit(ml)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebook: list[list[float]] | None = None,
    fit_fraction: float = 0.25,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer.

    The classic ANN scale path: a small KMeans codebook (trained on a
    deterministic-seed sample — :func:`fit_ivf_codebook` — or passed in
    pre-fit via ``codebook`` for reuse across calls), every corpus vector
    assigned to its nearest centroid (the 'inverted list'), and each
    query searched only in its ``n_probe`` nearest lists. Candidate set
    shrinks ~n_clusters/n_probe-fold; recall rises with n_probe. The
    assignment is ONE linear Arrow-batched pass with the codebook as a
    broadcast closure (``argmin ||v-c||²`` via the BLAS identity
    ``-2·V·Cᵀ + ||c||²``) — no training job, no shuffle.
    """
    from pyspark.sql import Window

    if codebook is None:
        codebook = fit_ivf_codebook(
            emb, n_clusters, vec_col, fit_fraction=fit_fraction
        )
    n_clusters = len(codebook)
    C = np.array(codebook, dtype=np.float64)  # (k, dim)
    c2 = (C * C).sum(axis=1)

    @pandas_udf("int")
    def nearest_center(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int32")
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        # ||v||² is constant per row — dropping it leaves argmin intact
        d = -2.0 * (V @ C.T) + c2[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    assigned = emb.withColumn("__cluster", nearest_center(F.col(vec_col)))

    centers_df = F.broadcast(
        emb.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(codebook)],
            "cluster int, center array<double>",
        )
    )

    # n_probe nearest centroids per query (small cross join: queries are a
    # batch, centroids a codebook).
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    qc = q.crossJoin(centers_df).select(
        query_id_col,
        "__qvec",
        "cluster",
        cosine(F.col("__qvec"), F.col("center")).alias("__ccos"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("__ccos").desc(), F.col("cluster")
    )
    probes = F.broadcast(
        qc.withColumn("__crank", F.row_number().over(wq))
        .filter(F.col("__crank") <= n_probe)
        .select(query_id_col, "__qvec", F.col("cluster").alias("__cluster"))
    )

    scored = assigned.join(probes, "__cluster").filter(
        F.col(query_id_col) != F.col(id_col)
    ).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__qvec"), F.col(vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def banded_hyperplane_keys(
    emb: DataFrame,
    n_bands: int = 8,
    band_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, key) rows: band i's key is ``band_bits`` hyperplane sign
    bits drawn from plane set ``[i*band_bits, (i+1)*band_bits)``.

    The banded analogue of MinHash-LSH for cosine space: two vectors are
    candidates iff they agree on *all* bits of *some* band — recall
    ``1-(1-p^r)^b`` with ``p = 1 - θ/π``. One linear pass; nothing
    quadratic.

    **Sizing rule (the scale knob):** expected candidate pairs ≈
    ``n_bands · N² / 2^(band_bits+1)`` — for the candidate stage to stay
    linear-ish, pick ``band_bits ≈ log2(N / desired_bucket_size)``. Too
    few bits makes the self-join quadratic (4 bits = 16 buckets/band
    turned a 2k-vector corpus into 0.8M candidate pairs); each extra bit
    halves candidates and multiplies per-true-pair recall by ``p``.

    Keys are computed by an Arrow-batched pandas UDF with
    **dimension-ordered accumulation**: the dot products fold over
    positions 0..dim-1 exactly like the Catalyst/DuckDB sequential
    ``aggregate``/``list_reduce`` form (same float64 adds, same order →
    bit-identical signs), but vectorized across the whole batch — the
    interpreted-HOF version costs ~ms/row at 32 planes × 64 dims, this
    costs µs/row. :func:`hyperplane_signs` remains the pure-Catalyst
    single-key form.
    """
    from pyspark.sql.functions import pandas_udf

    comps = np.array([
        [_plane_component(i, p) for p in range(dim)]
        for i in range(n_bands * band_bits)
    ])  # (n_planes, dim) float64

    @pandas_udf("array<bigint>")
    def band_keys(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        V = np.stack(vecs.to_numpy()).astype(np.float64)  # float32→f64 exact
        out = np.zeros((len(V), n_bands), dtype=np.int64)
        for band in range(n_bands):
            for j in range(band_bits):
                c = comps[band * band_bits + j]
                acc = np.zeros(len(V))
                for p in range(dim):  # dimension order == fold order
                    acc += V[:, p] * c[p]
                out[:, band] |= (acc > 0).astype(np.int64) << j
        return pd.Series(list(out))

    return emb.select(
        F.col(id_col),
        F.posexplode(band_keys(F.col(vec_col))).alias("band", "key"),
    ).withColumn("band", F.col("band").cast("long"))


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    all_pairs: bool = False,
    n_bands: int = 8,
    band_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold).

    Default path is **bucketed**: banded hyperplane-LSH candidates
    (:func:`banded_hyperplane_keys` self-join within (band, key) buckets
    only), then an exact cosine verify on the candidate pairs. Linear-ish
    at corpus scale — the shuffle carries (id, band, int64) triples and the
    verify join touches candidates only. Recall is ``1-(1-p^r)^b``
    (≈0.99 for cos≥0.95 near-dups at the default 8 bands × 8 bits);
    pinned against the all-pairs oracle in tests. Size ``band_bits``
    with the occupancy rule on :func:`banded_hyperplane_keys` —
    ``≈ log2(corpus / bucket)`` — or the candidate join goes quadratic.

    ``all_pairs=True`` is the O(N²) exact escape hatch — the *verify
    stage* form, for small corpora or post-candidate confirmation.
    """
    # Norms are precomputed once per VECTOR, not once per pair: the pair
    # expression dot/(na*nb) performs the identical operations in the
    # identical order as cosine() — bit-exact vs the oracle — but the
    # verify stage runs 1 array fold per pair instead of 3 (array HOFs
    # don't enter whole-stage codegen, so folds dominate the verify).
    if all_pairs:
        sided = emb.select(
            F.col(id_col), F.col(vec_col),
            _norm(F.col(vec_col)).alias("__n"),
        )
        a, b = sided.alias("a"), sided.alias("b")
        cos = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
            F.col("a.__n") * F.col("b.__n")
        )
        return (
            a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.round(cos, 6).alias("cos"),
            )
            .filter(F.col("cos") >= threshold)
        )
    keys = banded_hyperplane_keys(emb, n_bands, band_bits, dim,
                                  id_col, vec_col)
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
    # Verify stage: one dot product per candidate pair. Same
    # dimension-ordered-accumulation pandas UDF trick as the band keys
    # (bit-identical to the sequential fold, Arrow-vectorized across the
    # candidate batch) — candidates can be O(corpus) × band-width, so
    # this is the hot loop of the whole operator.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def seq_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        if not len(va):
            return pd.Series([], dtype=float)
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        acc = np.zeros(len(A))
        for p in range(A.shape[1]):  # dimension order == fold order
            acc += A[:, p] * B[:, p]
        return pd.Series(acc)

    ea = emb.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("__va"),
                    _norm(F.col(vec_col)).alias("__na"))
    eb = emb.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).alias("__vb"),
                    _norm(F.col(vec_col)).alias("__nb"))
    cos = seq_dot(F.col("__va"), F.col("__vb")) / (
        F.col("__na") * F.col("__nb")
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def semdedup(
    emb: DataFrame,
    eps: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[float]] | None = None,
    keep: str = "farthest",
    fit_fraction: float = 0.25,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup: cluster-then-prune semantic deduplication flags.

    The embedding-space dedup modality of Abbas et al., *SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication*
    (arXiv:2303.09540): assign every vector to its nearest centroid,
    then WITHIN each cluster mark as duplicates the members whose cosine
    to an earlier-ranked member is ≥ ``eps``. Pairwise LSH
    (:func:`embedding_dup_pairs`) approximates the same relation
    globally; SemDeDup bounds the quadratic exactly — pairs are only
    ever formed inside one cluster, so ``n_clusters`` is the explicit
    scale knob (the paper runs 50k clusters over LAION; size it so
    ``(corpus / n_clusters)²`` candidate pairs fit an executor).

    One-pass removal semantics, exactly the paper's upper-triangular
    formulation: cluster members are ordered (``keep='farthest'`` — the
    paper's choice — ranks LOW centroid-similarity first; ``'closest'``
    ranks high first; ties by id), and member *j* is removed iff SOME
    earlier member *i* has ``cos(i, j) >= eps`` — whether or not *i*
    itself survived. Not iterative, so the whole policy is window
    functions + one equi-join: SQL-expressible and oracle-paired.

    Plan shape at 100 TB: the codebook is a driver-side list compiled
    into ONE Catalyst projection (array of (cos, cluster) structs →
    ``array_max``) — assignment costs zero shuffles and zero Python.
    Ranking is one shuffle on ``cluster``; the candidate self-join is an
    equi-join on the same key (exchange reuse, never a cartesian); the
    verify cosine reuses the precomputed-norm trick of
    :func:`embedding_dup_pairs` (one fold per pair, bit-identical to
    :func:`cosine`). Pass ``codebook`` explicitly for reproducible
    output (e.g. pinned seed vectors); the default fits
    :func:`fit_ivf_codebook` (KMeans on a deterministic sample), which
    is engine-specific.

    Returns (id, cluster, centroid_cos, kept) — a FLAG table, not a
    filtered corpus, so the caller can audit removal rate per source
    before materializing (join back on id to materialize).
    """
    from pyspark.sql import Window

    if keep not in ("farthest", "closest"):
        raise ValueError(f"keep must be 'farthest' or 'closest', got {keep!r}")
    if codebook is None:
        codebook = fit_ivf_codebook(
            emb, n_clusters, vec_col, fit_fraction=fit_fraction, seed=seed
        )
    if not codebook:
        # array_max over zero structs would assign NULL clusters and
        # silently keep everything — refuse instead
        raise ValueError("semdedup: empty codebook")

    # argmax(cos, tie -> smallest cluster) as ONE expression: struct max
    # compares cos first, then -cluster, so equal-cos ties pick the
    # smallest cluster id — matching ORDER BY ccos DESC, cluster in SQL.
    # Centroid norms are precomputed DRIVER-SIDE (python float64 sums in
    # dimension order are bit-identical to the engine fold) and the
    # vector's own norm folds ONCE — 9 array folds per row instead of
    # 24 (array HOFs never enter codegen, so folds dominate assignment).
    cnorms = [_py_seq_norm(c) for c in codebook]
    nv = _norm(F.col(vec_col))
    scored = [
        F.struct(
            (
                _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
                / (F.col("__n") * F.lit(cn))
            ).alias("c"),
            F.lit(-i).alias("nc"),
        )
        for i, (c, cn) in enumerate(zip(codebook, cnorms))
    ]
    best = F.array_max(F.array(*scored))
    assigned = (
        emb.select(F.col(id_col), F.col(vec_col), nv.alias("__n"))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__n"),
            (-best["nc"]).alias("cluster"),
            best["c"].alias("__ccos"),
        )
    )

    order = (
        F.col("__ccos").asc() if keep == "farthest" else F.col("__ccos").desc()
    )
    ranked = assigned.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("cluster").orderBy(order, F.col(id_col))
        ),
    )
    # Verify stage (r14 optimization round): the within-cluster pairs
    # are never materialized in the engine at all. The r13 form
    # self-joined `ranked` on the cluster key and evaluated one
    # interpreted zip_with/aggregate fold per candidate pair —
    # cluster_size² rows through a join, a Filter, a distinct and a
    # join-back (3 reads of the assignment subtree). An earlier Arrow
    # attempt that shipped both 64-float arrays PER PAIR measured
    # slower than the JVM fold (6.7 s vs 4.7 s at sf0.1) — the guide
    # §8 lesson is to ship each vector ONCE and form pairs inside the
    # kernel: one applyInPandas per cluster (reusing the window's
    # hashpartitioning(cluster) — no new exchange) computes the full
    # pairwise-cosine decision with numpy accumulating in DIMENSION
    # order, i.e. acc[i,j] after step k equals the JVM fold's partial
    # sum exactly, so every IEEE add/mul/div happens in the identical
    # order and the `>= eps` decisions are bit-identical (pinned by
    # the Hypothesis python-model test and the degenerate-class pins
    # in tests/test_trainingdata_ops.py). Degenerate classes map 1:1:
    # a NULL vector or NULL component gave a NULL pair cosine (filter
    # drops it → never removed, never removes) — here a None cell is
    # excluded from pairing and a NaN component yields a NaN cosine
    # (NaN >= eps is False in numpy exactly as NULL/NaN fails the
    # Spark filter); length-mismatched pairs gave NULL via zip_with's
    # padding — here pairing is restricted to equal-length members.
    # Memory is blocked (O(block²)), never cluster_size². Arrow merges
    # a NULL __ccos into NaN on the way into pandas, so a null flag
    # rides along and restores the true NULL on the way out (a
    # zero-norm vector's GENUINE NaN cosine must stay NaN).
    from pyspark.sql import types as T

    id_field = assigned.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("cluster", T.IntegerType(), True),
            T.StructField("__ccos", T.DoubleType(), True),
            T.StructField("kept", T.BooleanType(), False),
        ]
    )
    blk = 2048

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__rn", kind="mergesort").reset_index(
            drop=True
        )
        embs = pdf[vec_col].tolist()
        norms = pdf["__n"].to_numpy(dtype=np.float64, na_value=np.nan)
        n = len(pdf)
        removed = np.zeros(n, dtype=bool)
        by_len: dict[int, list[int]] = {}
        for idx, e in enumerate(embs):
            if e is not None:
                by_len.setdefault(len(e), []).append(idx)
        for length, idxs in by_len.items():
            m = len(idxs)
            if m < 2 or length == 0:
                # empty vectors: dot 0.0 over norm 0.0 → NaN cosine on
                # both paths → never removed
                continue
            # float32 → float64 widening is exact, matching the JVM
            # fold's per-element double cast; a NULL component arrives
            # as NaN and poisons its pair cosines to NaN, exactly as
            # the NULL-propagating JVM fold fails the >= eps filter
            V = np.array([embs[i] for i in idxs], dtype=np.float64)
            ns = norms[idxs]
            for jb in range(0, m, blk):
                je = min(jb + blk, m)
                hit = np.zeros(je - jb, dtype=bool)
                for ib in range(0, je, blk):
                    ie = min(ib + blk, je)
                    acc = np.zeros((ie - ib, je - jb))
                    for k in range(length):
                        acc += np.multiply.outer(V[ib:ie, k], V[jb:je, k])
                    cos = acc / np.multiply.outer(ns[ib:ie], ns[jb:je])
                    mask = cos >= eps
                    if ib + blk > jb:
                        # intra-diagonal block: only i < j pairs count
                        ii = np.arange(ib, ie)[:, None]
                        jj = np.arange(jb, je)[None, :]
                        mask &= ii < jj
                    hit |= mask.any(axis=0)
                for c in np.flatnonzero(hit):
                    removed[idxs[jb + c]] = True
        ccos = pdf["__ccos"].astype(object)
        was_null = pdf["__cnull"].astype(bool)
        if was_null.any():
            ccos = ccos.where(~was_null, None)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["cluster"],
                "__ccos": ccos,
                "kept": ~removed,
            }
        )

    return (
        ranked.withColumn("__cnull", F.col("__ccos").isNull())
        .groupBy("cluster")
        .applyInPandas(_verify, out_schema)
        .select(
            id_col,
            "cluster",
            F.round("__ccos", 6).alias("centroid_cos"),
            "kept",
        )
    )


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the 4x
    storage/IO cut that makes a 100 TB embedding lake scannable: per
    vector ``scale = max|v| / 127`` and ``q_i = floor(v_i / scale)``
    (so ``q ∈ [-127, 127]``; an all-zero vector quantizes to zeros with
    scale 0). Dequantization ``q_i * scale`` reconstructs within one
    quantization step (``|v - q*s| < s``).

    floor, not round: both the division and the floor are single IEEE
    operations, bit-identical on every engine — round-half ties are
    exactly the cross-engine trap ``label_centroids`` documented. The
    result is clamped to [-127, 127]: the max-magnitude NEGATIVE
    component divides to -127 ± 1 ulp, and when the ulp lands below,
    floor would yield -128 — the clamp is itself deterministic, so
    cross-engine exactness survives.

    A vector containing a non-finite component (NaN or ±Inf) maps to
    (NULL scale, NULL qvec) — the same representation as a NULL input
    vector. Unguarded, NaN poisons the absmax fold (Spark's
    ``greatest`` ranks NaN above everything), so scale went NaN/Inf and
    EVERY component — including the healthy ones — quantized to 0 via
    ``floor(NaN)``; dequantize then resurrected the vector as all-NaN
    garbage feeding every downstream cosine/centroid. NULL is visible,
    engine-exact, and doesn't abort a corpus-scale job over one corrupt
    row (the replay packer's non-finite-rejection convention, applied
    to the representation a filter can act on).

    Pure Catalyst array transforms — zero shuffle, zero UDF; the
    aggregate fold for ``max|v|`` is order-independent (max).
    """
    # the absmax fold IS the non-finite detector — greatest holds NaN
    # above every double and |±Inf| is Inf, so any non-finite component
    # surfaces as a non-finite raw scale. The gate lives entirely in
    # the SECOND projection, where every reference is to the cheap
    # materialized ``__scale_raw`` column: any multi-reference of the
    # fold itself (when() over isnan/==Inf, nullif() which internally
    # references its arg twice, an exists() second array scan, or
    # per-element NaN-folding flops) measured 1.5-2x on the sf0.1
    # entry — Catalyst factors non-cheap common expressions into an
    # extra CodegenFallback projection layer whose row materialization
    # dominates. This form keeps the old plan shape exactly: two
    # projections, one fold, untouched per-element lambdas. NULL
    # array -> NULL fold -> NULL scale, the NULL-vec contract.
    absmax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    raw = F.col("__scale_raw")
    bad = F.isnan(raw) | (raw == F.lit(float("inf")))
    scale = F.when(~bad, raw)
    # NULL element -> NULL q (and back to NULL on dequantize): Spark's
    # least/greatest SKIP NULLs, so an unguarded clamp would silently
    # quantize a missing component to +127 — max-magnitude garbage
    # injected into every downstream cosine/centroid. A non-finite
    # vector maps to (NULL scale, NULL qvec) — same as a NULL input.
    q = F.when(
        bad,
        F.lit(None).cast("array<int>"),
    ).when(
        raw == 0.0,
        F.transform(
            F.col(vec_col),
            lambda x: F.when(x.isNotNull(), F.lit(0)).cast("int"),
        ),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.when(
                x.isNotNull(),
                F.greatest(
                    F.lit(-127),
                    F.least(
                        F.lit(127),
                        F.floor(x.cast("double") / raw),
                    ),
                ),
            ).cast("int"),
        )
    )
    orig_cols = [F.col(c) for c in emb.columns]
    return emb.withColumn(
        "__scale_raw", absmax / F.lit(127.0)
    ).select(*orig_cols, scale.alias(scale_col), q.alias(out_col))


def dequantize_embeddings(
    emb: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``v_i ≈ q_i * scale`` as
    ``array<float>``, shaped to feed the cosine/centroid/LSH machinery
    directly. Reconstruction error per component is < one quantization
    step (``scale``)."""
    return emb.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col),
            lambda q: (q.cast("double") * F.col(scale_col)).cast("float"),
        ),
    )


def hashed_embedding(
    docs: DataFrame,
    n_dims: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    dense: bool = True,
) -> DataFrame:
    """Deterministic hashing-trick document vectors (feature hashing /
    signed bag-of-words): every token votes ``±1`` into dimension
    ``hash32(token) % n_dims``, sign from the hash's next modulus class
    (``+1`` iff ``hash % 2*n_dims >= n_dims`` — pure integer modulo, so
    both the dimension and the sign are engine-exact; no float, no
    model). The classic cheap text embedding: good enough to feed the
    cosine / centroid / LSH machinery for near-dup and clustering work
    without any trained encoder, and reproducible forever.

    ``dense=True`` returns ``(id, embedding array<double>)`` ready for
    :func:`cosine_topk` / :func:`label_centroids`; ``dense=False``
    returns the sparse ``(id, dim, w)`` rows (zero weights dropped).
    Docs with NULL text vanish (no tokens to vote); empty text yields
    the single empty-string token, matching ``text.tokens`` everywhere
    else.

    Scale shape: explode → one groupBy(id, dim) with map-side combine —
    the shuffle carries at most ``n_dims`` cells per doc, not tokens;
    the dense assembly is a per-id map build, no extra exchange beyond
    the id rollup. Integer weights: exact, order-independent, no
    decimal needed.
    """
    from polymarket_data_ingestor_spark.functions.scalars import hash32
    from polymarket_data_ingestor_spark.operators.text import tokens

    ex = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok")
    )
    h = hash32(F.col("__tok"))
    pairs = ex.select(
        F.col(id_col),
        (h % n_dims).alias("dim"),
        F.when(h % (2 * n_dims) >= n_dims, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("__sign"),
    )
    sparse = (
        pairs.groupBy(id_col, "dim")
        .agg(F.sum("__sign").alias("w"))
        .filter(F.col("w") != 0)
    )
    if not dense:
        return sparse
    return (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("dim", "w"))
            ).alias("__m")
        )
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_dims - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i), F.lit(0)
                ).cast("double"),
            ).alias("embedding"),
        )
    )


def label_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Exact per-label centroid of an embedding column, order-independent.

    The building block for class prototypes, IVF-style codebook seeding,
    and embedding-space drift monitoring: one ``array<double>`` mean
    vector per label, plus ``n_vecs``. Each component is fixed to 12
    fractional digits by ``floor(v * 1e12)`` — one IEEE multiply + floor,
    bit-identical on every engine (decimal ROUNDING here is NOT: engines
    disagree half-up vs half-even on ties) — and summed as an exact
    integer decimal, so the total is independent of row order and
    partitioning (double sums would drift with the reduction tree).
    ONE double division chain per component at the edge.

    Scale shape: ``posexplode`` fans each vector into (label, dim, v)
    rows, but the groupBy's map-side partial aggregation collapses them
    to at most #labels x dim rows per map task before the shuffle — the
    exchange carries centroids-in-progress, never the corpus. The final
    per-label array assembly sorts a dim-length list, trivial. Adding
    10x more vectors changes per-task work, not shuffle volume.
    """
    ex = emb.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "__v")
    )
    # NULL COMPONENT refusal riding the summed value itself (the
    # pca_project discipline — a side-channel guard column could be
    # projection-pruned): SUM skips NULLs while the per-dim count does
    # not, so an unguarded NULL component would silently shrink that
    # dimension's mean toward 0 (review finding, reproduced: mean of
    # [NULL, 4.0] came back 2.0). A whole-NULL vector emits no
    # posexplode rows at all and is excluded from n_vecs — a missing
    # VECTOR is absence, a missing component is corruption.
    scaled = F.when(
        F.col("__v").isNull(),
        F.raise_error(F.lit(
            "label_centroids: NULL vector component — SUM would skip "
            "it while the count does not, silently shrinking the "
            "centroid toward 0; clean or filter upstream"
        )),
    ).otherwise(F.floor(F.col("__v").cast("double") * F.lit(1.0e12)))
    per_dim = ex.groupBy(label_col, "dim").agg(
        F.sum(scaled.cast("decimal(38,0)")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    mean = (
        F.col("__s").cast("double") / F.col("__n") / F.lit(1.0e12)
    ).alias("__m")
    return (
        per_dim.select(label_col, "dim", "__n", mean)
        .groupBy(label_col)
        .agg(
            F.max("__n").alias("n_vecs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "__m"))),
                lambda s: s["__m"],
            ).alias("centroid"),
        )
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate top-k result vs the exact one, in Spark.

    ``exact``/``approx`` are top-k result frames shaped like
    :func:`cosine_topk` output. Returns ONE row ``(k, n_queries,
    recall)`` where ``recall = |approx ∩ exact| / |exact|`` over
    ``(query, neighbor)`` pairs — the driver-checkable form of the ANN
    quality probes: the whole measurement runs distributed (two tiny
    top-k relations, one join, one aggregate — nothing touches the
    corpus again), and because the ratio is a division of two small
    exact integers it is bit-reproducible across engines.
    """
    # dropDuplicates on both sides: a generator that emits the same
    # (query, neighbor) twice (multiprobe union, banded self-join) must
    # not fan the left join out — duplicate matches would inflate BOTH
    # counts and recall would stop meaning |approx ∩ exact| / |exact|.
    e = exact.select(query_id_col, id_col).dropDuplicates()
    a = (
        approx.select(query_id_col, id_col)
        .dropDuplicates()
        .withColumn("__hit", F.lit(1))
    )
    flagged = e.join(a, [query_id_col, id_col], "left")
    # empty exact set -> 0/0: NULL recall (n_queries 0), not an ANSI
    # DIVIDE_BY_ZERO abort — an empty query batch must not kill the
    # measurement job (same poison-input class as vwap_bars)
    return flagged.agg(
        F.lit(int(k)).cast("long").alias("k"),
        F.countDistinct(query_id_col).cast("long").alias("n_queries"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.count("__hit").cast("double")
            / F.count(F.lit(1)).cast("double"),
        ).alias("recall"),
    )


def fit_pq_codebooks(
    emb: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    fit_fraction: float = 0.25,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector dimensions are
    split into ``n_subspaces`` contiguous subvectors and an independent
    ``n_centroids``-centroid KMeans codebook is fit per subspace (on the
    same deterministic-sample policy as :func:`fit_ivf_codebook`). A
    vector then compresses to ``n_subspaces`` small integers —
    ``n_subspaces·log2(n_centroids)`` bits instead of 32 bits per
    dimension (64-dim float32 → 4 bytes at 8×16: 64× compression) —
    which is what lets a 100 TB embedding corpus live in cluster MEMORY
    for search, the regime where IVF/LSH still stream from disk.

    Returns ``codebooks[m][c] = centroid`` (plain lists: cheap on the
    driver, broadcast as a closure constant, reusable across encode and
    search calls — fit once per corpus version).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_df = (
        emb.select(vec_col)
        if fit_fraction >= 1.0
        else emb.select(vec_col).sample(fraction=fit_fraction, seed=seed)
    )
    # one materialization: the n_subspaces sequential KMeans fits (and
    # the dimension probe) otherwise EACH re-run the sampled corpus
    # scan — n_subspaces redundant 100 TB passes in the training job
    fit_df = fit_df.persist()
    try:
        first = fit_df.first()
        if first is None:
            raise ValueError("cannot fit PQ codebooks on an empty corpus")
        dim = len(first[0])
        if dim % n_subspaces != 0:
            raise ValueError(
                f"dim {dim} not divisible by n_subspaces {n_subspaces}"
            )
        w = dim // n_subspaces
        out: list[list[list[float]]] = []
        for m in range(n_subspaces):
            sub = fit_df.select(
                array_to_vector(
                    F.slice(F.col(vec_col), m * w + 1, w)
                ).alias("__features")
            )
            model = KMeans(
                k=n_centroids, seed=seed + m, featuresCol="__features",
                predictionCol="__cluster",
            ).fit(sub)
            out.append(
                [[float(x) for x in c] for c in model.clusterCenters()]
            )
    finally:
        fit_df.unpersist()
    return out


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Compress each vector to its per-subspace nearest-centroid codes —
    one zero-shuffle Arrow pass with the codebooks as a broadcast
    closure (same BLAS argmin identity as :func:`ivf_topk`'s assigner,
    run once per subspace). Output keeps the input columns plus
    ``out_col: array<int>`` of length ``n_subspaces``."""
    Cs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    c2s = [(C * C).sum(axis=1) for C in Cs]
    w = Cs[0].shape[1]

    @pandas_udf("array<int>")
    def codes(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        cols = []
        for m, (C, c2) in enumerate(zip(Cs, c2s)):
            S = V[:, m * w:(m + 1) * w]
            d = -2.0 * (S @ C.T) + c2[None, :]
            cols.append(d.argmin(axis=1).astype(np.int32))
        M = np.stack(cols, axis=1)
        return pd.Series(list(M))

    return emb.withColumn(out_col, codes(F.col(vec_col)))


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebooks: list[list[list[float]]] | None = None,
    fit_fraction: float = 0.25,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    product-quantized codes, with exact re-ranking: each query
    precomputes a ``n_subspaces × n_centroids`` lookup table of partial
    dot products against the codebooks, and a corpus vector's ADC score
    is then ``n_subspaces`` table lookups + adds — no float vector is
    touched during the scan, which streams only the 64×-compressed
    codes column (cosine vs the RECONSTRUCTION: ``dot(q, v̂)`` from the
    LUTs, ``|v̂|²`` from a centroid-norm table). The ADC pass keeps
    ``k·refine`` candidates per query; a final exact pass re-scores
    ONLY those (the standard PQ refinement step — quantization decides
    what to look at, never the reported score), so returned cosines are
    identical to :func:`cosine_topk`'s for the pairs both produce, and
    recall is the candidate coverage.

    Scale shape: the ADC scan is the :func:`cosine_topk` two-level
    pattern (per-partition k·refine-best in one ``mapInPandas`` pass —
    bounded state, zero shuffle — then a rank-window merge over
    P × n_queries × k·refine rows), and the refinement joins the
    nq×k·refine candidate set (broadcast) back to the corpus — the
    expensive float vectors are read for thousands of rows, not the
    corpus. Recall-gated against the exact anchor in pytest.
    """
    from pyspark.sql import Window

    if refine < 1:
        raise ValueError(f"refine must be >= 1, got {refine}")

    if codebooks is None:
        codebooks = fit_pq_codebooks(
            emb, n_subspaces, n_centroids, vec_col,
            fit_fraction=fit_fraction,
        )
    n_subspaces = len(codebooks)
    Cs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    cn2 = np.stack([(C * C).sum(axis=1) for C in Cs])  # (m, k_c)
    w = Cs[0].shape[1]

    probe = _collect_query_probe(queries, query_id_col, vec_col, "pq_topk")
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    id_t = emb.schema[id_col].dataType.simpleString()
    mid_schema = f"{query_id_col} {qid_t}, {id_col} {id_t}, __score double"
    if not probe:
        return (
            emb.sparkSession.createDataFrame([], mid_schema)
            .select(
                query_id_col, id_col,
                F.col("__score").alias("score"),
                F.lit(0).cast("long").alias("rank"),
            )
            .limit(0)
        )
    qids = np.array([r[0] for r in probe])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in probe])
    nq = len(qids)
    qn = np.sqrt((Q * Q).sum(axis=1))
    if np.any((qn == 0.0) | ~np.isfinite(qn)):
        bad = [q for q, n in zip(qids.tolist(), qn)
               if n == 0.0 or not np.isfinite(n)][:5]
        raise ValueError(
            f"pq_topk: zero-norm or non-finite query vector(s) {bad} — "
            "cosine is undefined; filter upstream"
        )
    # LUT[j, m, c] = dot(q_j subvector m, codebook m centroid c)
    lut = np.stack(
        [Q[:, m * w:(m + 1) * w] @ Cs[m].T for m in range(n_subspaces)],
        axis=1,
    )

    encoded = pq_encode(emb, codebooks, id_col, vec_col)

    kk = k * refine

    def _partition_topk(batches):
        c_ids = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        c_sc = [np.empty(0) for _ in range(nq)]
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            ids = pdf[id_col].to_numpy()
            codes = np.stack(pdf["pq_codes"].to_numpy())  # (n, m)
            rows = np.arange(n_subspaces)[None, :]
            # dot(q, v̂) = Σ_m LUT[j, m, code_m]; |v̂|² = Σ_m |c|²
            dots = lut[:, rows, codes].sum(axis=2)  # (nq, n)
            vn = np.sqrt(cn2[rows, codes].sum(axis=1))  # (n,)
            if np.any(vn == 0.0):
                # only reachable when every assigned centroid is the
                # zero vector — same NaN-ranks-first hazard as the
                # cosine_topk kernel, same loud refusal
                bad = ids[vn == 0.0][:5].tolist()
                raise ValueError(
                    f"pq_topk: zero-norm reconstruction for id(s) "
                    f"{bad} — ADC score undefined; check the codebooks"
                )
            score = dots / (qn[:, None] * vn[None, :])
            for j in range(nq):
                mask = ids != qids[j]
                all_ids = np.concatenate([c_ids[j], ids[mask]])
                all_sc = np.concatenate([c_sc[j], score[j, mask]])
                order = np.lexsort((all_ids, -np.round(all_sc, 6)))[:kk]
                c_ids[j], c_sc[j] = all_ids[order], all_sc[order]
        if any_rows:
            n_out = sum(len(c) for c in c_ids)
            if n_out:
                yield pd.DataFrame(
                    {
                        query_id_col: np.repeat(
                            qids, [len(c) for c in c_ids]
                        ),
                        id_col: np.concatenate(c_ids),
                        "__score": np.concatenate(c_sc),
                    }
                )

    part = encoded.select(id_col, "pq_codes").mapInPandas(
        _partition_topk, schema=mid_schema
    )
    w_adc = Window.partitionBy(query_id_col).orderBy(
        F.round("__score", 6).desc(), F.col(id_col)
    )
    cand = (
        part.withColumn("__adc_rank", F.row_number().over(w_adc))
        .filter(F.col("__adc_rank") <= kk)
        .select(query_id_col, id_col)
    )
    # exact refinement: re-score ONLY the nq × k·refine candidates with
    # the true vectors — quantization chose what to look at, the exact
    # cosine decides the reported score and final rank
    qdf = F.broadcast(
        emb.sparkSession.createDataFrame(
            [(r[0], [float(x) for x in r[1]]) for r in probe],
            f"{query_id_col} {qid_t}, __qvec array<double>",
        )
    )
    scored = (
        emb.join(F.broadcast(cand), id_col)
        .join(qdf, query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine(F.col("__qvec"), F.col(vec_col)), 6
            ).alias("score"),
        )
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# PCA over an embedding column: exact-covariance monoid fit + Catalyst
# projection
# ---------------------------------------------------------------------------

def fit_pca(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
) -> dict:
    """Fit a PCA rotation for an embedding column in ONE distributed
    pass — the dimensionality-reduction step the embedding stack
    (IVF/PQ/LSH, SemDeDup, ANN) runs in front of at scale, where a
    64 -> 8 projection cuts every downstream distance computation and
    shuffle 8x.

    The sufficient statistics are a MONOID (the ``linreg_rollup``
    design, vectorized): per Arrow batch a numpy partial
    ``(n, colsum, X^T X)`` — one row of ``1 + d + d^2`` doubles per
    partition, never per vector — then a positional explode +
    ``groupBy(pos)`` reduce to a single ``d x d``-sized row set
    (``<= 1 + d + d^2`` rows TOTAL crosses the one exchange, whatever
    the corpus size). The eigendecomposition runs driver-side on the
    tiny ``d x d`` covariance (``numpy.linalg.eigh``) — the same
    fit-once/apply-many split as :func:`fit_ivf_codebook`, and like
    that codebook the fit is engine-specific: cross-partition float
    combine order makes the last ulp layout-dependent, so exactness
    pins live in pytest (vs numpy, with tolerance) rather than a SQL
    oracle; :func:`pca_project` under a PINNED rotation is exact.

    Returns ``{"n", "mean", "components", "explained_variance"}`` —
    ``components`` is a k x d list (rows = principal axes, descending
    eigenvalue), sign-normalized so each row's largest-|x| entry is
    positive (eigenvector sign is otherwise arbitrary — the
    deterministic convention makes refits comparable).
    """
    import numpy as np

    # probe over NON-NULL vectors only — the fit scan below excludes
    # NULLs, and a probe that read size(NULL) from whatever row
    # happened to scan first would fail a valid corpus
    # layout-dependently (review finding, reproduced)
    d_probe = (
        emb.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    if d_probe is None or d_probe["d"] is None:
        raise ValueError("fit_pca: empty input or all vectors NULL")
    d = int(d_probe["d"])
    if not (1 <= k <= d):
        raise ValueError(f"fit_pca: k must be in [1, {d}], got {k}")

    def partials(batches):
        import pandas as pd

        n, s, q = 0, np.zeros(d), np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # length pre-check BEFORE np.array: a ragged batch would
            # otherwise die inside numpy with an opaque
            # inhomogeneous-shape error instead of this message
            bad = {len(v) for v in pdf[vec_col]} - {d}
            if bad:
                raise ValueError(
                    f"fit_pca: ragged vectors (got dims {sorted(bad)}, "
                    f"expected {d})"
                )
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if np.isnan(x).any():
                raise ValueError(
                    "fit_pca: NULL/NaN vector components — a NaN is "
                    "absorbing under + and would silently poison every "
                    "covariance entry; clean or filter upstream"
                )
            n += x.shape[0]
            s += x.sum(axis=0)
            q += x.T @ x
        if n:
            yield pd.DataFrame(
                {"vals": [[float(n)] + s.tolist() + q.ravel().tolist()]}
            )

    flat = (
        # NULL vectors are excluded from the fit (n counts present
        # vectors); NaN COMPONENTS inside a present vector raise in the
        # kernel instead — silent exclusion there would be a
        # row-dependent covariance
        emb.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(partials, "vals array<double>")
        .select(F.posexplode("vals").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    vals = np.zeros(1 + d + d * d)
    for r in flat:
        vals[r["pos"]] = r["v"]
    n = int(vals[0])
    if n < 2:
        raise ValueError(f"fit_pca: need >= 2 vectors, got {n}")
    s, q = vals[1 : 1 + d], vals[1 + d :].reshape(d, d)
    mean = s / n
    cov = (q - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return {
        "n": n,
        "mean": [float(x) for x in mean],
        "components": [[float(x) for x in row] for row in comps],
        "explained_variance": [float(max(evals[i], 0.0)) for i in order],
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project an embedding column through a PREFIT PCA rotation —
    pure Catalyst, zero shuffle, zero Python.

    ``model`` is :func:`fit_pca`'s output (or any ``{"mean",
    "components"}`` dict). Per output axis j:
    ``out_j = sum_i (v_i - mean_i) * C[j][i]`` as a sequential
    ``zip_with`` + ``aggregate`` fold over literal arrays — the
    :func:`cosine` discipline, so under a PINNED rotation the result is
    a deterministic pure function of the input on any engine, any
    partitioning. Appends ``out_col`` as ``array<double>`` of length k.
    Projecting 100 TB is exactly as parallel as scanning it.
    """
    mean = model["mean"]
    comps = model["components"]
    if not comps or any(len(c) != len(mean) for c in comps):
        raise ValueError(
            "pca_project: components/mean dimension mismatch "
            f"({[len(c) for c in comps]} vs {len(mean)})"
        )
    d = len(mean)
    # r14 optimization round: the centering subtract is factored into
    # its OWN projected column instead of being inlined into every
    # per-axis fold — HOFs are CodegenFallback, so Catalyst's
    # subexpression elimination never deduplicates them and the r13
    # form re-evaluated the d subtractions k times per row.
    # CollapseProject leaves the alias alone (non-cheap expression
    # referenced k times), which the plan gate below this function's
    # tests pin. The rotation rows enter as SINGLE array literals
    # (numpy float64 round-trips exactly) rather than d scalar lit
    # nodes — identical values, k·d fewer expression nodes to analyze.
    # Arithmetic order is unchanged: subtract, then multiply, then the
    # same sequential fold — bit-identical to the r13 form.
    ctr = f"__pca_ctr_{out_col}"
    centered = F.zip_with(
        F.col(vec_col),
        F.lit(np.asarray(mean, dtype=np.float64)),
        lambda x, m: x.cast("double") - m,
    )
    out = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(ctr),
                    F.lit(np.asarray(row, dtype=np.float64)),
                    lambda x, c: x * c,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for row in comps
        ]
    )
    # The contract raises live IN the value column (the r12 advisor
    # lesson: a side-channel guard column can be projection-pruned):
    # zip_with pads a short vector with NULLs, and a NULL COMPONENT
    # inside a right-length vector would likewise fold to a silent
    # all-NULL output array — both refuse loudly, mirroring fit_pca's
    # NaN refusal (review finding: the first guard caught only the
    # length case). A NULL vector projects to NULL (without the
    # explicit branch the per-axis folds would emit an array OF
    # nulls — a k-element value for a missing input).
    out = (
        F.when(F.col(vec_col).isNull(), F.lit(None))
        .when(
            F.size(F.col(vec_col)) != F.lit(d),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"pca_project: rotation is {d}-dim but vector has "
                    ),
                    F.size(F.col(vec_col)).cast("string"),
                    F.lit(" components"),
                )
            ),
        )
        .when(
            F.exists(F.col(vec_col), lambda x: x.isNull()),
            F.raise_error(F.lit(
                "pca_project: NULL vector component — the fold would "
                "emit a silent all-NULL projection; clean or filter "
                "upstream (fit_pca refuses the same input)"
            )),
        )
        .otherwise(out)
    )
    return (
        df.withColumn(ctr, centered)
        .withColumn(out_col, out)
        .drop(ctr)
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 8,
    seed: int = 1,
    vec_col: str = "embedding",
    out_col: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection — the FIT-FREE
    dimensionality cut for the embedding stack: ``out_j = (1/sqrt(k)) *
    sum_i v_i * s_ij`` with ``s_ij = +-1`` derived from the portable
    ``hash32("rp{seed}:{j}:{i}")`` parity (Achlioptas 2003, the
    database-friendly JL construction). Where :func:`fit_pca` buys the
    best k axes with a corpus pass, this buys distance-preserving-in-
    expectation axes for FREE — no fit, no model artifact, and because
    the matrix is a pure function of (seed, dims) the SAME projection
    is reproducible on any engine, any day (it is fully
    SQL-expressible via the ``_SQL_DOT`` sequential fold + md5 parity,
    unlike a fitted rotation).

    Pure Catalyst: the sign matrix compiles in as literal arrays and
    each output axis is the :func:`cosine`-discipline sequential
    ``zip_with`` + ``aggregate`` fold — zero shuffle, zero Python;
    projecting 100 TB is exactly as parallel as scanning it. Guards
    ride the value column (NULL vector -> NULL row; wrong length or
    NULL component -> raise), mirroring :func:`pca_project`.
    """
    from polymarket_data_ingestor_spark.operators.dedup import _h32

    if out_dim < 1:
        raise ValueError(f"random_projection: out_dim must be >= 1, "
                         f"got {out_dim}")
    d_probe = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    if d_probe is None or d_probe["d"] is None:
        raise ValueError(
            "random_projection: empty input or all vectors NULL"
        )
    d = int(d_probe["d"])
    inv = 1.0 / float(out_dim) ** 0.5
    signs = [
        [
            1.0 if _h32(f"rp{seed}:{j}:{i}") % 2 == 0 else -1.0
            for i in range(d)
        ]
        for j in range(out_dim)
    ]
    out = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(s) for s in row]),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            * F.lit(inv)
            for row in signs
        ]
    )
    out = (
        F.when(F.col(vec_col).isNull(), F.lit(None))
        .when(
            F.size(F.col(vec_col)) != F.lit(d),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"random_projection: sign matrix is {d}-dim but "
                        f"vector has "
                    ),
                    F.size(F.col(vec_col)).cast("string"),
                    F.lit(" components"),
                )
            ),
        )
        .when(
            F.exists(F.col(vec_col), lambda x: x.isNull()),
            F.raise_error(F.lit(
                "random_projection: NULL vector component — the fold "
                "would emit a silent all-NULL projection; clean or "
                "filter upstream"
            )),
        )
        .otherwise(out)
    )
    return df.withColumn(out_col, out)
