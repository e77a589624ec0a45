"""Hashed-n-gram Naive-Bayes document classifier (beyond-reference).

The cheap linear text classifier every large-scale curation pipeline
keeps around — the fastText-style domain/language/quality gate (CCNet
and DCLM both filter with one; Joulin et al. arXiv:1607.01759 is the
public recipe): multinomial Naive Bayes over hashed unigram+bigram
buckets, fit on a labeled slice, applied to the whole corpus. It
generalizes the DSIR binary log-ratio (``sampling.dsir_model``) to K
labeled classes with priors, argmax prediction, and a confidence
margin — DSIR asks "how target-like is this doc", the classifier asks
"WHICH class is this doc, and by how much".

Fit-once / score-many split, the ``dsir_model`` / ``fit_ivf_codebook``
convention:

* :func:`nb_model` — fit on a labeled DataFrame; the model is a small
  DataFrame bounded by ``K x n_buckets + K`` rows (never corpus-sized),
  so persisting it is one tiny parquet.
* :func:`nb_predict` — batch path, zero Python: ONE corpus featurize
  scan, one ``(doc, bucket)`` count exchange, a broadcast join against
  the bucket -> ``map<class, weight>`` model (model-sized by
  construction), then one ``groupBy(doc)`` carrying all K class sums at
  once. The per-class scores explode to ``docs x K`` rows and the
  argmax window runs on the SAME partitioning the aggregate produced —
  no extra exchange. Nothing corpus-text-sized moves after the first
  exchange at any corpus size.
* :func:`nb_score` — the stateless Arrow scorer twin (the
  ``dsir_score`` pattern): model held in the closure, exact
  python-Decimal arithmetic bit-identical to the batch path, safe to
  run unchanged on a STREAMING DataFrame (no state store, no
  watermark).

Cross-engine exactness (the ``bigram_lm_score`` discipline): every
model weight and prior is a log-ratio rounded to 9 dp into
decimal(18,9) BEFORE any per-doc sum, so per-doc class scores are
exact decimal arithmetic — order-independent under any shuffle, and
two engines can only disagree on true ties, which break by class name.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

#: Model row schema: weight rows carry (__c, __b, __w); per-class meta
#: rows carry (__c, NULL, NULL, __w0, __prior) — the unseen-bucket
#: smoothing weight and the log prior. __nb (the hash-space size) rides
#: on every row: it is part of the model's identity, and the appliers
#: refuse a featurization that disagrees with it (the kmv mixed-(k,seed)
#: hazard, closed structurally — appliers READ __nb instead of taking a
#: parameter that could drift).
_MODEL_SCHEMA = Ty.StructType(
    [
        Ty.StructField("__c", Ty.StringType()),
        Ty.StructField("__b", Ty.LongType()),
        Ty.StructField("__w", Ty.DecimalType(18, 9)),
        Ty.StructField("__w0", Ty.DecimalType(18, 9)),
        Ty.StructField("__prior", Ty.DecimalType(18, 9)),
        Ty.StructField("__nb", Ty.IntegerType()),
    ]
)


def nb_model(
    labeled: DataFrame,
    label_col: str = "lang",
    n_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit the classifier: per-(class, bucket) log-likelihood weights
    plus per-class meta rows, ``<= K x n_buckets + K`` rows total.

    Multinomial NB with add-one smoothing over ``n_buckets``:
    ``__w[c,b] = ln((m_cb + 1) / (tot_c + B))`` for buckets class c's
    training docs hit, ``__w0[c]`` the same ratio at ``m = 0`` (what an
    unseen bucket scores), ``__prior[c] = ln(n_docs_c / n_docs)``.
    Rows with a NULL label or NULL id are excluded from the fit.

    Scale shape: the feature histogram is ONE map-side-combined count
    over the hashed feature stream (the label rides through the
    featurization — no corpus-sized join anywhere); class totals and
    the doc-count grand total ride as window sums over the MODEL-sized
    histogram / K-row prior table (never an agg-then-join-back that
    would re-derive the corpus, the dsir_model discipline).
    """
    from polymarket_data_ingestor_spark.operators.sampling import (
        _dsir_feature_stream,
    )

    lab = labeled.filter(F.col(label_col).isNotNull())
    feats = _dsir_feature_stream(
        lab, text_col, id_col, n_buckets, extra_cols=(label_col,)
    )
    per_class = Window.partitionBy(label_col)
    hist = (
        feats.groupBy(label_col, "__b")
        .agg(F.count(F.lit(1)).alias("__m"))
        .withColumn("__tc", F.sum("__m").over(per_class))
    )

    def _ll(cnt, tot):
        return (
            F.round(F.log((cnt + F.lit(1.0)) / (tot + F.lit(n_buckets))), 9)
            .cast("decimal(18,9)")
        )

    weights = hist.select(
        F.col(label_col).alias("__c"),
        F.col("__b"),
        _ll(F.col("__m"), F.col("__tc")).alias("__w"),
        F.lit(None).cast("decimal(18,9)").alias("__w0"),
        F.lit(None).cast("decimal(18,9)").alias("__prior"),
        F.lit(n_buckets).alias("__nb"),
    )
    # Per-class feature totals for the meta rows, as a model-sized
    # distinct over the histogram (every hist row already carries its
    # class total) — NOT a second corpus aggregate.
    totals = hist.select(label_col, "__tc").distinct()
    everything = Window.partitionBy()
    priors = (
        lab.filter(F.col(id_col).isNotNull())
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("__ndc"))
        .withColumn("__nd", F.sum("__ndc").over(everything))
    )
    # A class whose training docs produce zero feature instances (all
    # empty text) still exists: left join, total coalesced to 0.
    meta = priors.join(totals, label_col, "left").select(
        F.col(label_col).alias("__c"),
        F.lit(None).cast("long").alias("__b"),
        F.lit(None).cast("decimal(18,9)").alias("__w"),
        _ll(F.lit(0), F.coalesce(F.col("__tc"), F.lit(0))).alias("__w0"),
        F.round(F.log(F.col("__ndc") / F.col("__nd")), 9)
        .cast("decimal(18,9)")
        .alias("__prior"),
        F.lit(n_buckets).alias("__nb"),
    )
    return weights.unionByName(meta)


def _model_rows(model) -> list:
    rows = model.collect() if isinstance(model, DataFrame) else list(model)
    metas = [r for r in rows if r["__b"] is None]
    if not metas:
        raise ValueError(
            "nb: model has no per-class meta rows — fit nb_model on a "
            "non-empty labeled corpus first"
        )
    nbs = {int(r["__nb"]) for r in rows}
    if len(nbs) != 1:
        raise ValueError(
            f"nb: model mixes hash-space sizes {sorted(nbs)} — refusing "
            f"to score against incompatible featurizations"
        )
    # A truncated model (weight rows whose class lost its meta row, e.g.
    # via a careless filter) would otherwise be SILENTLY ignored by the
    # appliers — the class simply never wins. Refuse loudly instead.
    meta_classes = {r["__c"] for r in metas}
    orphans = sorted(
        {r["__c"] for r in rows if r["__b"] is not None} - meta_classes
    )
    if orphans:
        raise ValueError(
            f"nb: model carries weight rows for classes {orphans} with no "
            f"meta row (prior/w0) — a filtered/truncated model; refit or "
            f"pass the full nb_model output"
        )
    return rows


def nb_predict(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classify documents against a PREFIT model (batch, zero Python).

    ``model`` is :func:`nb_model`'s output (a DataFrame — collected
    here, bounded by ``K x n_buckets + K`` rows) or its pre-collected
    rows. Per doc: ``score_c = prior_c + sum_b m_b * w[c,b]`` with
    unseen buckets scoring ``w0_c``; the prediction is the argmax with
    exact-decimal comparison, ties broken by the SMALLEST class name.
    Returns ``(id, n_feats, label, score, margin)`` — margin is the
    decimal gap to the runner-up class (NULL for a 1-class model), the
    standard confidence gate. Docs with no features (empty/NULL text)
    drop out, the ``dsir_log_weights`` convention, and so do NULL-id
    docs (unkeyable in the per-doc rollup — the monoid convention; use
    :func:`nb_score`, which keys on nothing, to score them); the
    streaming twin :func:`nb_score` also emits the prior argmax for
    featureless docs.

    Plan shape (r15, guide §4.1/§2.3): the class scoring is FOLDED INTO
    the Arrow featurize kernel — per input row it tokenizes, hashes,
    and emits ``(n_grams, K long-nano partial scores)`` directly, so
    the aggregate's input is #rows, never #gram-instances (the r14 form
    exploded one row per gram instance through a broadcast join into
    the hash aggregate — at sf0.1 that was 536k rows of join+agg for
    5k docs). The kernel's scoring is one vectorized int64
    gather+reduce per doc over a dense ``(n_buckets x K)`` weight
    matrix (model-sized by construction: ``n_buckets`` rows of K
    nanos, unseen buckets pre-filled with ``w0``) — integer adds ARE
    the decimal adds, so outputs are bit-identical to the decimal
    pipeline. The single shuffle moves docs x (K+1) longs; the argmax
    window partitions on the same key the aggregate just produced:
    Catalyst reuses the partitioning, no second shuffle.

    Overflow envelope: per-doc long-nano scores overflow at the same
    ~4·10⁸-feature doc where the old decimal(28,9) sum buffer sat. The
    kernel guards it EXPLICITLY (raises past 2³¹ grams/doc, far below
    any overflow) — unlike the JVM long sum, whose non-ANSI mode would
    wrap silently (r14 advisor note), the guard holds under any SQL
    mode.
    """
    rows = _model_rows(model)
    n_buckets = int(rows[0]["__nb"])

    # Weights are decimal(18,9) — exactly 9 dp — so every weight is an
    # integer count of NANOS (w · 10⁹), and all per-doc class sums are
    # exact int64 arithmetic (r14, guide §2.3 "narrower types"). The
    # final scores re-enter the decimal domain via an exact ·10⁻⁹
    # rescale before the double cast, so output bits are identical to
    # the original decimal pipeline.
    def _nanos(d: Decimal) -> int:
        return int(d.scaleb(9))

    classes = sorted(
        (r["__c"], _nanos(Decimal(r["__w0"])), _nanos(Decimal(r["__prior"])))
        for r in rows
        if r["__b"] is None
    )
    weight_rows = [
        (int(r["__b"]), r["__c"], _nanos(Decimal(r["__w"])))
        for r in rows
        if r["__b"] is not None
    ]
    bad = sorted({b for b, _, _ in weight_rows if not 0 <= b < n_buckets})
    if bad:
        raise ValueError(
            f"nb: model weight rows carry buckets {bad[:5]} outside "
            f"[0, {n_buckets}) — the model disagrees with its own __nb; "
            f"refit or pass the full nb_model output"
        )
    scored = (
        _nb_partial_scores(
            df, text_col, id_col, n_buckets,
            [c for c, _, _ in classes],
            [w0 for _, w0, _ in classes],
            weight_rows,
        )
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_feats"),
            *[
                F.sum(F.col(f"__p{i}")).alias(f"__s{i}")
                for i in range(len(classes))
            ],
        )
        # featureless docs (empty/NULL text) drop out — the
        # dsir_log_weights convention the per-instance form got for
        # free (no feature rows → no group); per-row partials emit
        # n=0 rows, so the drop is explicit here
        .filter(F.col("n_feats") > 0)
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("__c"),
                (F.col(f"__s{i}") + F.lit(pr)).alias("__score"),
            )
            for i, (c, _, pr) in enumerate(classes)
        ]
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col("__c").asc()
    )
    # exact 10⁻⁹ rescale: long nanos × decimal(1,9) literal — the
    # product is the same decimal value the old decimal pipeline
    # carried, so the double casts below are bit-identical
    nano = F.lit(Decimal("1E-9"))
    return (
        scored.select(id_col, "n_feats", F.explode(pairs).alias("__p"))
        .select(id_col, "n_feats", "__p.__c", "__p.__score")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__second", F.lead("__score").over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            "n_feats",
            F.col("__c").alias("label"),
            (F.col("__score") * nano).cast("double").alias("score"),
            ((F.col("__score") - F.col("__second")) * nano)
            .cast("double")
            .alias("margin"),
        )
    )


def _nb_partial_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    class_names: list,
    w0_nanos: list,
    weight_rows: list,
) -> DataFrame:
    """Per input ROW: ``(id, __n grams, __p0..__pK-1 long-nano class
    scores)`` from ONE Arrow kernel — featurize and score fused.

    The featurization is the exact ``_dsir_feature_stream`` twin
    (``_py_tokens`` / ``_h32_cached``: whitespace unigrams + space-
    joined bigrams hashed into ``n_buckets`` — every bucket value
    bit-identical to the Catalyst/DuckDB ``hash32`` featurization).
    Scoring gathers rows of a dense int64 ``(n_buckets, K)`` weight
    matrix (unseen buckets pre-filled with ``w0``) and reduces with
    int64 adds — exact integer arithmetic, order-independent, so the
    per-row partials sum to the same totals under any shuffle.

    The matrix is rebuilt per Arrow batch from the model lists in the
    closure (the struct-returning iterator signature is unsupported in
    Spark 4.1's pandas_udf) — at ``n_buckets=10k`` and single-digit K
    that is one ~100 KB ``np.tile`` + a model-sized scatter, well under
    a millisecond against a 10k-row batch. Rows with NULL text emit
    ``(0, 0...)`` — the caller drops zero-feature ids after the merge.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from polymarket_data_ingestor_spark.operators.dedup import (
        _h32_cached,
        _py_tokens,
    )

    K = len(class_names)
    cls_index = {c: k for k, c in enumerate(class_names)}
    out_fields = ", ".join(
        ["__n: bigint"] + [f"__p{i}: bigint" for i in range(K)]
    )

    @pandas_udf(f"struct<{out_fields}>")
    def partial_scores(texts):
        W = np.tile(
            np.asarray(w0_nanos, dtype=np.int64), (n_buckets, 1)
        )
        for b, c, w in weight_rows:
            W[b, cls_index[c]] = w
        ns = np.zeros(len(texts), dtype=np.int64)
        ps = np.zeros((len(texts), K), dtype=np.int64)
        for j, t in enumerate(texts):
            if t is None:
                continue
            toks = _py_tokens(t)
            feats = [
                _h32_cached(w) % n_buckets for w in toks if w != ""
            ]
            feats.extend(
                _h32_cached(a + " " + b) % n_buckets
                for a, b in zip(toks, toks[1:])
                if a != "" and b != ""
            )
            if not feats:
                continue
            if len(feats) > 2**31:  # pragma: no cover - guard only
                # int64 nano-sums overflow around 4e8 features/doc;
                # fault loudly like the ANSI decimal path did
                # instead of wrapping silently
                raise ValueError(
                    f"nb: document with {len(feats)} features "
                    f"exceeds the exact long-nano scoring envelope"
                )
            ns[j] = len(feats)
            ps[j] = W[np.asarray(feats, dtype=np.int64)].sum(
                axis=0, dtype=np.int64
            )
        out = pd.DataFrame({"__n": ns})
        for i in range(K):
            out[f"__p{i}"] = ps[:, i]
        return out

    return (
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            partial_scores(F.col(text_col)).alias("__ps"),
        )
        .select(
            id_col,
            F.col("__ps.__n").alias("__n"),
            *[
                F.col(f"__ps.__p{i}").alias(f"__p{i}")
                for i in range(K)
            ],
        )
    )


def nb_score(df: DataFrame, model, text_col: str = "text") -> DataFrame:
    """Classify with a PREFIT model via ONE zero-shuffle Arrow kernel —
    the streaming-safe scorer twin of :func:`nb_predict`.

    Tokenize + bigram + hash exactly as the fit did (the verified
    ``_py_tokens`` / ``_h32`` twins of the Catalyst featurization), sum
    9-dp-decimal weights EXACTLY per class (python Decimal — the same
    order-independent arithmetic as the batch aggregate, pinned
    bit-identical in tests), argmax with the same smallest-class
    tie-break. Appends (n_feats, label, score, margin).

    Stateless per-row projection => runs unchanged on a STREAMING
    DataFrame: fit on the historical lake, score the live feed — no
    state store, no watermark. Featureless docs can't be retroactively
    dropped from a stream, so they score the PRIOR argmax with
    ``n_feats = 0`` (convention pinned in tests; the batch path drops
    them instead).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from polymarket_data_ingestor_spark.operators.dedup import (
        _h32,
        _py_tokens,
    )

    appended = {"n_feats", "label", "score", "margin"}
    clash = sorted(appended & set(df.columns))
    if clash:
        raise ValueError(
            f"nb_score appends columns {sorted(appended)} but the input "
            f"already has {clash} — rename or drop them first (the "
            f"duplicate names would make every later reference "
            f"AMBIGUOUS_REFERENCE)"
        )
    rows = _model_rows(model)
    B = int(rows[0]["__nb"])
    classes = sorted(
        (r["__c"], Decimal(r["__w0"]), Decimal(r["__prior"]))
        for r in rows
        if r["__b"] is None
    )
    wmap = {
        (int(r["__b"]), r["__c"]): Decimal(r["__w"])
        for r in rows
        if r["__b"] is not None
    }

    @pandas_udf(
        "struct<n_feats: bigint, label: string, score: double,"
        " margin: double>"
    )
    def score(texts):
        ns, ls, ss, ms = [], [], [], []
        for t in texts:
            toks = (
                [w for w in _py_tokens(t) if w != ""]
                if t is not None
                else []
            )
            grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            ns.append(len(grams))
            buckets = [_h32(g) % B for g in grams]
            best = second = None
            for c, w0, prior in classes:  # sorted: ties keep first=min c
                acc = prior
                for b in buckets:
                    acc += wmap.get((b, c), w0)
                if best is None or acc > best[1]:
                    best, second = (c, acc), best
                elif second is None or acc > second[1]:
                    second = (c, acc)
            ls.append(best[0])
            ss.append(float(best[1]))
            ms.append(
                float(best[1] - second[1]) if second is not None else None
            )
        return pd.DataFrame(
            {"n_feats": ns, "label": ls, "score": ss, "margin": ms}
        )

    return df.withColumn("__sc", score(F.col(text_col))).select(
        *df.columns, "__sc.n_feats", "__sc.label", "__sc.score", "__sc.margin"
    )
