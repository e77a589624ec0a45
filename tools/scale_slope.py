"""Scale-slope measurement: does wall-clock grow ~linearly with input size?

Generates ~10x variants of the three heaviest inputs in /tmp (never touching
/root/testdata) and times the flagship operators at 1x and 10x:

* replay — the bench fixture generator re-run with 10x messages/hour;
* minhash_lsh_pairs — documents unioned 10x with a per-copy text
  perturbation (exact copies would inflate every LSH bucket with
  identical members and measure pair-explosion, not scan scaling);
* embedding_dup_pairs_lsh — embeddings unioned 10x with a deterministic
  per-copy vector rotation, band_bits raised by log2(10)≈3 per the
  documented occupancy rule (the knob IS the scale contract: fixed bits
  at 10x the rows would measure bucket-occupancy blowup by design).

Prints one JSON line per rung: {op, scale, rows, sec}. A slope ratio
(sec_10x / sec_1x) near 10 (or below — fixed overheads amortize) is the
pass signal; quadratic behavior shows up as ratios near 100.

Usage: python tools/scale_slope.py [--skip-replay]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from polymarket_data_ingestor_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TMP = Path("/tmp/pdi_scale")


REPEATS = 2


def _time2(fn) -> float:
    """Min-of-REPEATS after one warm-up run (default 2; --repeats N)."""
    fn()  # warm page cache / JIT
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def replay_fixture(msgs_per_hour: int, tag: str) -> list[str]:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    import fixture_gen
    from fixture_gen import write_fixture_files

    out = TMP / f"replay_{tag}"
    marker = out / "_DONE"
    if not marker.exists():
        old_m, old_a = fixture_gen.N_MARKETS, fixture_gen.ASSETS_PER_MARKET
        fixture_gen.N_MARKETS, fixture_gen.ASSETS_PER_MARKET = 100, 2
        try:
            write_fixture_files(out, n_hours=12,
                                msgs_per_hour=msgs_per_hour, seed=42)
        finally:
            fixture_gen.N_MARKETS, fixture_gen.ASSETS_PER_MARKET = old_m, old_a
        marker.write_text("ok")
    return sorted(str(p) for p in out.glob("*.jsonl"))


def main() -> None:
    global REPEATS
    skip_replay = "--skip-replay" in sys.argv
    only_replay = "--only-replay" in sys.argv
    if "--repeats" in sys.argv:
        REPEATS = int(sys.argv[sys.argv.index("--repeats") + 1])
    spark = get_spark(app_name="scale-slope")
    spark.range(1000).count()
    results = []

    if not skip_replay:
        from polymarket_data_ingestor_spark.operators.replay import replay

        for scale, mph in ((1, 100_000), (10, 1_000_000)):
            paths = replay_fixture(mph, f"x{scale}")
            n = replay(spark, paths).count()
            sec = _time2(lambda: replay(spark, paths).count())
            results.append({"op": "replay", "scale": scale,
                            "rows": n, "sec": sec})
            print(json.dumps(results[-1]), flush=True)
            # The skew-split path must also scale ~linearly: its extra
            # stages (per-(asset,file) ordinal window + per-file totals)
            # are all width-preserving, so a super-linear slope here
            # means a serial stage crept back into segment assignment.
            # snapshots_per_segment=50 keeps the gate HOT at both
            # scales (1x ≈ 91 book events per (asset,file) cell, 10x ≈
            # 910) — with the default stride the safe-by-default gate
            # would take the plain path at 1x and the split path at
            # 10x, and the "slope" would compare two different plans.
            sec = _time2(lambda: replay(
                spark, paths, split_at_snapshots=True,
                snapshots_per_segment=50).count())
            results.append({"op": "replay_split", "scale": scale,
                            "rows": n, "sec": sec})
            print(json.dumps(results[-1]), flush=True)

    if only_replay:
        by_op = {}
        for r in results:
            by_op.setdefault(r["op"], {})[r["scale"]] = r["sec"]
        print(json.dumps({"slope_10x_over_1x": {
            op: round(v[10] / v[1], 2)
            for op, v in by_op.items() if 1 in v and 10 in v
        }, "repeats": REPEATS}))
        return

    # ---- documents 10x (text perturbed per copy) ----
    from polymarket_data_ingestor_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" c{i}")).alias("text"),
        )
        for i in range(10)
    ]
    docs10 = copies[0]
    for c in copies[1:]:
        docs10 = docs10.unionByName(c)
    d10_path = str(TMP / "documents_x10.parquet")
    if not Path(d10_path).exists():
        docs10.write.parquet(d10_path)
    docs1 = docs.select("doc_id", "text")
    docs10 = spark.read.parquet(d10_path)

    for scale, d in ((1, docs1), (10, docs10)):
        sec = _time2(lambda: minhash_lsh_pairs(d).count())
        results.append({"op": "minhash_lsh_pairs", "scale": scale,
                        "rows": n_docs * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # exact dedup in its r14 single-scan window form: one exchange on
    # the digest, so the slope should track the shuffle volume
    from polymarket_data_ingestor_spark.operators.dedup import (
        drop_exact_dupes,
    )

    for scale, d in ((1, docs1), (10, docs10)):
        sec = _time2(lambda: drop_exact_dupes(d).count())
        results.append({"op": "drop_exact_dupes", "scale": scale,
                        "rows": n_docs * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # line dedup in its r14 single-scan posexplode_outer form: the line
    # digest rollup + broadcast tag + regroup-by-doc should all track
    # the corpus linearly (the fixture's docs are single-line, which
    # still exercises explode -> md5 rollup -> tag -> regroup)
    from polymarket_data_ingestor_spark.operators.dedup import (
        remove_boilerplate_lines,
    )

    for scale, d in ((1, docs1), (10, docs10)):
        sec = _time2(lambda: remove_boilerplate_lines(d).count())
        results.append({"op": "remove_boilerplate_lines", "scale": scale,
                        "rows": n_docs * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # the flagship composition whose scan budget the r14 rework fixed
    # (quality filter -> single-scan exact dedup -> stratified sample ->
    # sequence packing -> doc join): every stage is width-preserving or
    # key-bounded, so the slope should track the corpus. The 10x copies
    # carry no lang column; a doc_id%3 synthetic keeps the stratum MIX
    # (and so the sample's survival rate) identical at both scales.
    from polymarket_data_ingestor_spark.operators.packing import (
        pack_sequences,
    )
    from polymarket_data_ingestor_spark.operators.sampling import (
        stratified_sample,
    )
    from polymarket_data_ingestor_spark.operators.text import quality_score

    def _curation(d):
        lab = d.withColumn(
            "lang",
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
        )
        kept = quality_score(lab).filter(F.col("quality") >= 0.5)
        deduped = drop_exact_dupes(kept)
        sampled = stratified_sample(
            deduped, {"en": 1.0, "de": 0.5}, seed=1, default_rate=0.25
        )
        packed = pack_sequences(sampled, seq_len=128, shard_size=100)
        first_seq = packed.filter(F.col("doc_start") == 0).select(
            "seq_id", "doc_id"
        )
        return first_seq.join(
            sampled.select("doc_id", "lang", "quality"), "doc_id"
        ).count()

    for scale, d in ((1, docs1), (10, docs10)):
        sec = _time2(lambda: _curation(d))
        results.append({"op": "curation_pipeline", "scale": scale,
                        "rows": n_docs * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    if "--until-curation" in sys.argv:
        by_op = {}
        for r in results:
            by_op.setdefault(r["op"], {})[r["scale"]] = r["sec"]
        print(json.dumps({"slope_10x_over_1x": {
            op: round(v[10] / v[1], 2)
            for op, v in by_op.items() if 1 in v and 10 in v
        }, "repeats": REPEATS}))
        return

    # ---- round-5 text ops on the same 1x/10x documents fixture ----
    # (the per-copy " c{i}" suffix also perturbs each copy's trailing
    # bigram/window, so cross-copy hot-window/bigram collapse is mild)
    from polymarket_data_ingestor_spark.operators.dedup import (
        substring_dup_pairs,
    )
    from polymarket_data_ingestor_spark.operators.text import (
        bigram_lm_score,
    )

    from polymarket_data_ingestor_spark.operators.text import (
        bm25_scores as _bm25,
        inverted_index as _inverted_index,
        with_token_counts,
    )

    for op, fn in (
        ("doc_bigram_lm", bigram_lm_score),
        ("substring_dup_pairs",
         lambda d: substring_dup_pairs(d, k=8, min_shared=2)),
        # zero-shuffle Arrow scan: the slope should track raw row count
        # (a super-linear slope means the word memo or broadcast vocab
        # stopped amortizing). The filter consumes n_tok so count()
        # cannot prune the tokenizer UDF out of the timed plan.
        ("wordpiece_counts",
         lambda d: with_token_counts(d).filter(F.col("n_tok") >= 0)),
        # one term-keyed exchange; postings are part of the aggregate so
        # count() cannot prune the collect_set out of the timed plan
        ("inverted_index", lambda d: _inverted_index(d, min_df=2)),
        # only the match set shuffles: the slope should track the scan,
        # with the top-50 TakeOrdered constant
        ("bm25_search",
         lambda d: _bm25(d, ("query", "window", "scan"))),
    ):
        for scale, d in ((1, docs1), (10, docs10)):
            sec = _time2(lambda: fn(d).count())
            results.append({"op": op, "scale": scale,
                            "rows": n_docs * scale, "sec": sec})
            print(json.dumps(results[-1]), flush=True)

    # ---- embeddings 10x (vectors rotated per copy; occupancy-rule bits) ----
    from polymarket_data_ingestor_spark.operators.similarity import (
        embedding_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb.count()
    ecopies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            # deterministic per-copy perturbation: circular shift by i —
            # preserves norms and the near-dup geometry within each copy
            F.expr(
                f"concat(slice(embedding, {i + 1}, size(embedding)), "
                f"slice(embedding, 1, {i}))"
            ).alias("embedding"),
        )
        for i in range(10)
    ]
    emb10 = ecopies[0]
    for c in ecopies[1:]:
        emb10 = emb10.unionByName(c)
    e10_path = str(TMP / "embeddings_x10.parquet")
    if not Path(e10_path).exists():
        emb10.write.parquet(e10_path)
    emb10 = spark.read.parquet(e10_path)

    # occupancy rule: band_bits ≈ log2(N / bucket); +3 bits at 10x
    for scale, e, bits in ((1, emb, 8), (10, emb10, 11)):
        sec = _time2(
            lambda: embedding_dup_pairs(e, band_bits=bits).count()
        )
        results.append({"op": "embedding_dup_pairs_lsh", "scale": scale,
                        "rows": n_emb * scale, "sec": sec,
                        "band_bits": bits})
        print(json.dumps(results[-1]), flush=True)

    # ---- label centroids on the same 1x/10x embeddings ----
    # (labels unchanged across copies: shuffle volume is #labels x dims
    # per map task at EVERY scale — the slope isolates scan/fan-out cost)
    from polymarket_data_ingestor_spark.operators.similarity import (
        label_centroids,
    )

    for scale, e in ((1, emb), (10, emb10)):
        # emb10 carries no label column; derive one with FIXED
        # cardinality at both scales so the shuffle volume claim
        # (#labels x dims per map task) is what the slope measures
        labeled = e.withColumn(
            "label", (F.col("vec_id") % 10).cast("int")
        )
        sec = _time2(lambda: label_centroids(labeled).count())
        results.append({"op": "label_centroids", "scale": scale,
                        "rows": n_emb * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # ---- events 10x: gap_fill + delta_volatility ----
    # copies keep ts/event_type and shift event_id: bucket/key structure
    # (and so gap_fill's spine size) is IDENTICAL at both scales, so the
    # slope measures the rollup/window sweep, not output growth.
    from polymarket_data_ingestor_spark.operators.analytics import (
        delta_volatility,
        gap_fill,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_ev = ev.count()
    ev10_path = str(TMP / "events_x10.parquet")
    if not Path(ev10_path).exists():
        ev10 = ev
        for i in range(1, 10):
            ev10 = ev10.unionByName(
                ev.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 100_000_000)
                )
            )
        ev10.write.parquet(ev10_path)
    ev10 = spark.read.parquet(ev10_path)

    from polymarket_data_ingestor_spark.operators.analytics import (
        transition_matrix,
    )

    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_rollup,
        merge_rollup,
        rollup_state,
    )

    def _inc_rollup(d):
        # the catalog entry's shape: 70/30 split, state + delta merged.
        # Key count is FIXED across scales (event_type x day), so the
        # merge stage is constant-size — the slope isolates the two
        # state-building scans, which is the incremental-maintenance
        # cost claim.
        dd = d.withColumn("day", F.date_trunc("day", F.col("ts")))
        keys = ("event_type", "day")
        hist = rollup_state(dd.filter(F.col("event_id") % 10 < 7), keys)
        delta = rollup_state(dd.filter(F.col("event_id") % 10 >= 7), keys)
        return finalize_rollup(
            merge_rollup(hist, delta, keys=keys)
        ).count()

    for op, fn in (
        ("gap_fill", lambda d: gap_fill(d).count()),
        ("delta_volatility", lambda d: delta_volatility(d).count()),
        # per-user sequences are 10x denser at 10x: the slope measures
        # the lag-window sweep (the only event-granularity pass)
        ("event_transitions", lambda d: transition_matrix(d).count()),
        ("incremental_rollup", _inc_rollup),
    ):
        for scale, d in ((1, ev), (10, ev10)):
            sec = _time2(lambda: fn(d))
            results.append({"op": op, "scale": scale,
                            "rows": n_ev * scale, "sec": sec})
            print(json.dumps(results[-1]), flush=True)

    # ---- r13 ops on the shared 1x/10x fixtures ----
    # dsir_weights: target = the lang='en' slice of the SAME scale
    # (docs10 copies carry no lang column — rejoin by original doc_id
    # parity is overkill; a deterministic doc_id%3 slice plays the
    # target role identically for slope purposes). The model stays
    # <= 10k rows at both scales; the slope measures the two
    # featurize+count passes.
    from polymarket_data_ingestor_spark.operators.sampling import (
        dsir_log_weights,
    )

    for scale, d in ((1, docs1), (10, docs10)):
        tgt = d.filter(F.col("doc_id") % 3 == 0)
        sec = _time2(lambda: dsir_log_weights(d, tgt).count())
        results.append({"op": "dsir_weights", "scale": scale,
                        "rows": n_docs * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # semdedup: n_clusters IS the quadratic knob (the paper scales
    # clusters with the corpus) — 10x rows get 10x clusters, keeping
    # expected cluster size (and so pairs-per-cluster) constant; fixed
    # clusters at 10x rows would measure the designed-in within-cluster
    # quadratic, not scan scaling. Codebook pinned from the 1x corpus
    # (n smallest vec_ids) so the fit is untimed at both scales.
    from polymarket_data_ingestor_spark.operators.similarity import (
        semdedup,
    )

    seeds32 = [
        [float(x) for x in r[0]]
        for r in emb.select("embedding").orderBy("vec_id")
        .limit(80).collect()
    ]
    for scale, e, ncl in ((1, emb, 8), (10, emb10, 80)):
        cb = seeds32[:ncl]
        sec = _time2(lambda: semdedup(e, eps=0.35, codebook=cb).count())
        results.append({"op": "semdedup", "scale": scale,
                        "rows": n_emb * scale, "sec": sec,
                        "n_clusters": ncl})
        print(json.dumps(results[-1]), flush=True)

    # ---- r13-session ops: NB classifier + PCA ----
    # nb: synthetic 5-class label (doc_id % 5 — the 10x copies carry no
    # lang column), fit on the hash-split-style 80% slice, predict the
    # whole corpus. The model stays <= 5*10k rows at both scales; the
    # slope measures fit featurize + the one predict featurize/agg.
    from polymarket_data_ingestor_spark.operators.classify import (
        nb_model,
        nb_predict,
    )
    from polymarket_data_ingestor_spark.functions.scalars import hash32

    def _nb(d):
        lab = d.withColumn(
            "lang", (F.col("doc_id") % 5).cast("string")
        )
        train = lab.filter(
            hash32(F.col("doc_id").cast("string"), seed=7) % 10000 < 8000
        )
        return nb_predict(
            d, nb_model(train, label_col="lang")
        ).count()

    for scale, d in ((1, docs1), (10, docs10)):
        sec = _time2(lambda: _nb(d))
        results.append({"op": "nb_classify", "scale": scale,
                        "rows": n_docs * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # pca: fit (the input-sized stage: one numpy-partial kernel pass +
    # the model-sized positional reduce) + full projection. k fixed —
    # the model is dimension-sized, never corpus-sized.
    from polymarket_data_ingestor_spark.operators.similarity import (
        fit_pca,
        pca_project,
    )

    def _pca(e):
        m = fit_pca(e, k=8)
        return pca_project(e, m).count()

    for scale, e in ((1, emb), (10, emb10)):
        sec = _time2(lambda: _pca(e))
        results.append({"op": "pca_fit_project", "scale": scale,
                        "rows": n_emb * scale, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # ---- kmv_overlap in the CAPACITY regime (r12 verdict #8) ----
    # Synthetic high-cardinality input: 24 keys whose member sets are
    # ~n/24 distinct ids each (k=1024 << distinct-per-key at BOTH
    # scales, so every sketch is saturated — the 100 TB regime; the r12
    # 1.01 slope was measured on sf0.1 events where some keys ran under
    # capacity and the exact branch shortcut part of the work). Members
    # are drawn from a shared pool (stride-7919 residues mod n/3) so
    # key pairs genuinely overlap and the estimator path runs. The
    # state build is the only input-sized stage; the pair join is
    # state-sized and CONSTANT across scales — a ~linear ratio is the
    # pass signal, quadratic means the capacity bound leaked.
    from polymarket_data_ingestor_spark.operators.analytics import (
        kmv_overlap_pairs,
        sample_rollup_state,
    )

    kmv_inputs = {}
    for scale in (1, 10):
        n = 200_000 * scale
        p = str(TMP / f"kmv_capacity_x{scale}.parquet")
        if not Path(p).exists():
            spark.range(n).select(
                (F.col("id") % 24).cast("string").alias("k"),
                ((F.col("id") * 7919) % (n // 3)).alias("m"),
            ).write.parquet(p)
        kmv_inputs[scale] = (n, spark.read.parquet(p))

    def _kmv_capacity(d):
        st = sample_rollup_state(d, ("k",), "m", k=1024, seed=7)
        return kmv_overlap_pairs(st, ("k",)).count()

    for scale, (n, d) in kmv_inputs.items():
        sec = _time2(lambda: _kmv_capacity(d))
        results.append({"op": "kmv_overlap_capacity", "scale": scale,
                        "rows": n, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    # slope summary
    by_op: dict[str, dict[int, float]] = {}
    for r in results:
        by_op.setdefault(r["op"], {})[r["scale"]] = r["sec"]
    summary = {
        op: round(v[10] / v[1], 2)
        for op, v in by_op.items()
        if 1 in v and 10 in v
    }
    print(json.dumps({"slope_10x_over_1x": summary}))


if __name__ == "__main__":
    main()
