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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.functions.scalars import hash32


def _dot(a, b) -> F.Column:
    # explicit double casts before multiply: float32 inputs promoted the
    # same way in any engine → bit-reproducible sums (sequential fold)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a, b) -> F.Column:
    """Cosine similarity of two array<numeric> columns (JVM fold, no UDF)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, embedding). The query side is broadcast (query
    batches are small by construction); ranking ties broken by neighbor id
    for determinism. Output: (query_id, vec_id, cos, rank).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    cos = cosine(F.col("__qvec"), F.col(vec_col))
    scored = (
        emb.crossJoin(q)
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cos, 6).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signs(
    vec_col: str, n_planes: int = 16, dim: int = 64
) -> F.Column:
    """Deterministic random-hyperplane LSH bucket key (int64).

    Plane components are pseudo-random in [-0.5, 0.5] derived from
    ``hash32(plane:pos)`` — reproducible everywhere, no stored model.
    Bit j = sign of <v, plane_j>.
    """
    def plane_component(j, p):
        return (hash32(F.concat_ws(":", j.cast("string"), p.cast("string")))
                % 1000).cast("double") / 1000.0 - 0.5

    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))

    def bit(j):
        pos = F.sequence(F.lit(0), F.lit(dim - 1))
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(pos, lambda p: plane_component(j, p)),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        # 2^j via pow (exact for j<53): F.shiftleft can't take a Column shift
        return F.when(
            dot > 0, F.pow(F.lit(2.0), j.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    return F.aggregate(
        F.transform(planes, bit), F.lit(0).cast("long"), lambda a, b: a + b
    )


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    With b sign bits the corpus fans into 2^b buckets; the candidate join is
    bucket-equi instead of cross — the linear scale path. Recall < 1 by
    construction; raise by lowering ``n_planes`` or multi-probing.
    """
    from pyspark.sql import Window

    e = emb.withColumn("__bucket", hyperplane_signs(vec_col, n_planes, dim))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
        ).withColumn("__bucket", hyperplane_signs("__qvec", n_planes, dim))
    )
    cos = cosine(F.col("__qvec"), F.col(vec_col))
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


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer.

    The classic ANN scale path: train a small KMeans codebook (MLlib,
    deterministic seed), assign every corpus vector to its nearest centroid
    (the 'inverted list'), and search each query only in its ``n_probe``
    nearest lists. Candidate set shrinks ~n_clusters/n_probe-fold; recall
    rises with n_probe. The codebook is trained once and broadcast — at
    100 TB the corpus assignment is a single linear pass, and re-training
    samples a fraction (``KMeans`` on a ``.sample()``).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    ml_emb = emb.withColumn("__features", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_clusters, seed=42, featuresCol="__features",
                predictionCol="__cluster")
    model = km.fit(ml_emb)
    assigned = model.transform(ml_emb).drop("__features")

    centers = model.clusterCenters()
    centers_df = F.broadcast(
        emb.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
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

    scored = (
        emb.withColumn("__cluster", F.col("__cluster"))
        if "__cluster" in emb.columns
        else assigned
    ).join(probes, "__cluster").filter(
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


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold).

    All-pairs form for exactness; at scale route through
    :func:`cosine_topk_lsh` buckets first and verify candidates here.
    """
    a, b = emb.alias("a"), emb.alias("b")
    cos = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
