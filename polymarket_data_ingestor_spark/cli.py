"""Command-line interface — reference CLI parity (SURVEY §3.1, §3.3).

Mirrors ``cli/src/main.rs``:

* ``replay -t 24h -o ticks.parquet [--markets id,...]`` — time-range →
  hour-file pruning → stateful replay → Parquet tick sink (S7: snappy, the
  reference's codec; ``tick_generator.rs:60-63``). Output extension fix-up
  matches ``main.rs:148-156``.
* ``markets [filter] [--format pretty|csv|json] [-t range] [--last]`` —
  first (or last) ``active_markets`` snapshot → substring filter → token
  unnest → sink (S8 CSV columns ``question,question_id,outcome,token_id``
  per ``main.rs:224-231``; S9 pretty; raw JSON).
* ``collect [--out-dir d] [--markets-file f] [--sampling] [--compress]``
  — the reference's ``collector`` binary: live WebSocket collection into
  hourly framed JSONL logs (``collector/src/main.rs:300-407``).

Beyond the reference CLI (maintenance surface for the partitioned lake
and the frame logs — the jobs a production deployment schedules):

* ``lake compact|delete|upsert <path> ...`` — small-file compaction,
  targeted keyed deletion (right-to-be-forgotten), and partition-scoped
  MERGE, wrapping the ``sinks`` module primitives.
* ``manifests --data-dir d`` — backfill gate-manifest sidecars for a
  frame lake that predates them, so replay's skew gate is a sidecar
  read instead of a raw scan.

Usage: ``python -m polymarket_data_ingestor_spark <command> ...``
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

from polymarket_data_ingestor_spark.session import get_spark
from polymarket_data_ingestor_spark.sources.paths import (
    discover_files,
    parse_time_range,
    parse_timestamp_multi,
)


def _resolve_paths(data_dir: str, time_range: str | None,
                   start: str | None, end: str | None) -> list[str]:
    candidates = [
        p
        for pat in ("*.jsonl", "*.jsonl.zst", "*.jsonl.gz")
        for p in glob.glob(str(Path(data_dir) / pat))
    ]
    # one file per hour bucket: a compressed+uncompressed pair of the
    # same hour (an archival step that left the original behind) would
    # otherwise replay the hour TWICE and silently double its ticks
    # (review finding). Preference mirrors the collector's archival
    # format: .zst, then .gz, then plain.
    rank = {".zst": 0, ".gz": 1}
    by_hour: dict[str, str] = {}
    for p in sorted(candidates):
        stem = Path(p).name.split(".jsonl")[0]
        if stem not in by_hour or (
            rank.get(Path(p).suffix, 2)
            < rank.get(Path(by_hour[stem]).suffix, 2)
        ):
            by_hour[stem] = p
    dropped = sorted(set(candidates) - set(by_hour.values()))
    if dropped:
        print(
            f"warning: ignoring {len(dropped)} duplicate-hour file(s) "
            f"(compressed sibling preferred): {', '.join(dropped)}",
            file=sys.stderr,
        )
    candidates = sorted(by_hour.values())
    t0 = t1 = None
    if time_range:
        t0, t1 = parse_time_range(time_range)
    if start:
        t0 = parse_timestamp_multi(start)
    if end:
        t1 = parse_timestamp_multi(end)
    return discover_files(candidates, t0, t1)


def cmd_replay(args: argparse.Namespace) -> int:
    from polymarket_data_ingestor_spark.operators.replay import replay

    paths = _resolve_paths(args.data_dir, args.time_range, args.start, args.end)
    if not paths:
        print("no log files in range", file=sys.stderr)
        return 1
    out = args.output
    # extension fix-up like main.rs:148-156
    if not out.endswith(".parquet"):
        out += ".parquet"
    # filter empties like every sibling comma-list parse: a trailing
    # comma would otherwise inject '' into the market filter; a value
    # that is ALL empties is ambiguous (filter-nothing vs filter-all),
    # so refuse rather than guess
    markets = (
        [m for m in args.markets.split(",") if m] if args.markets else None
    )
    if args.markets and not markets:
        print("--markets given but contains no market ids",
              file=sys.stderr)
        return 2
    spark = get_spark(app_name="pdi-replay")
    ticks = replay(spark, paths, markets=markets,
                   in_log_order=args.log_order)
    ticks.write.mode("overwrite").parquet(out, compression="snappy")
    n = spark.read.parquet(out).count()
    print(f"wrote {n} ticks from {len(paths)} file(s) to {out}")
    return 0


def cmd_markets(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from polymarket_data_ingestor_spark.sources.frames import read_frames
    from polymarket_data_ingestor_spark.sources.markets import (
        filter_markets,
        market_tokens,
        read_market_info,
    )

    paths = _resolve_paths(args.data_dir, args.time_range, args.start, args.end)
    if not paths:
        print("no log files in range", file=sys.stderr)
        return 1
    # first file in range, or last when no range given (main.rs:179-185);
    # either way the reference reads the FIRST active_markets frame of the
    # chosen file (snapshots may repeat mid-file if re-logged), so
    # last=False in both cases.
    no_range = not (args.time_range or args.start or args.end)
    spark = get_spark(app_name="pdi-markets")
    frames = read_frames(spark, [paths[-1] if no_range else paths[0]])
    mkts = read_market_info(frames, last=False)
    if args.filter:
        mkts = filter_markets(mkts, args.filter)

    if args.format == "json":
        for row in mkts.toJSON().collect():
            print(row)
    elif args.format == "csv":
        toks = market_tokens(mkts).select(
            "question", "question_id", "outcome", "token_id"
        )
        if args.output:
            toks.coalesce(1).write.mode("overwrite").csv(
                args.output, header=True
            )
            print(f"wrote {args.output}")
        else:
            print("question,question_id,outcome,token_id")
            for r in toks.collect():
                # reference does a naive comma join (main.rs:224-231)
                print(f"{r.question},{r.question_id},{r.outcome},{r.token_id}")
    else:  # pretty (main.rs:204-241, minus ANSI colors)
        for r in mkts.select(
            "question", "condition_id", "tokens"
        ).collect():
            print(r.question)
            print(f"  condition_id: {r.condition_id}")
            for t in r.tokens or []:
                print(f"  {t.outcome}: {t.token_id} @ {t.price}")
    return 0


def cmd_collect(args: argparse.Namespace) -> int:
    """Live collection — the reference's primary ``collector`` binary
    (``collector/src/main.rs:300-407``): fetch active markets, open one
    WebSocket per market chunk, write hourly-rotating framed JSONL.

    ``--markets-file`` substitutes a local JSON market list for the REST
    fetch; the socket transport itself is the gated
    :class:`~..streaming.collector.WebsocketsTransport` unless a test
    injects a fake through the module attribute.
    """
    from polymarket_data_ingestor_spark.sources.rest import (
        active_filter,
        fetch_markets,
        fetch_sampling_markets,
        http_fetch_page,
    )
    from polymarket_data_ingestor_spark.streaming import collector

    if args.markets_file:
        markets = json.loads(Path(args.markets_file).read_text())

        def fetch() -> list[dict]:
            return active_filter(markets)
    elif args.sampling:
        def fetch() -> list[dict]:
            return active_filter(
                fetch_sampling_markets(http_fetch_page("/sampling-markets"))
            )
    else:
        def fetch() -> list[dict]:
            return active_filter(fetch_markets(http_fetch_page()))

    final = collector.collect(
        args.out_dir, fetch, compress=args.compress
    )
    if final is not None:
        print(f"final file: {final}")
    return 0


def _pcols(args: argparse.Namespace) -> tuple[str, ...]:
    return tuple(c for c in args.partition_cols.split(",") if c)


def _stat_merges() -> dict:
    """The ONE stat-name → variadic merge-fn map, shared by
    ``lake stats`` and ``lake compact-labels`` — two parallel maps
    would silently disagree when the next monoid lands (r11 review)."""
    from polymarket_data_ingestor_spark.operators.analytics import (
        merge_corr_rollup,
        merge_distinct_rollup,
        merge_heavy_hitters,
        merge_linreg_rollup,
        merge_minhash_rollup,
        merge_quantile_rollup,
        merge_rollup,
        merge_sample_rollup,
        merge_topk_rollup,
    )

    return {
        "summary": merge_rollup,
        "distinct": merge_distinct_rollup,
        "quantiles": merge_quantile_rollup,
        "heavyhitters": merge_heavy_hitters,
        "sample": merge_sample_rollup,
        "topk": merge_topk_rollup,
        "minhash": merge_minhash_rollup,
        "linreg": merge_linreg_rollup,
        "corr": merge_corr_rollup,
    }


#: the ONE list of monoid stat names — every lake subcommand's
#: --stat choices must come from here (parallel lists drift)
_STAT_CHOICES = ["summary", "distinct", "quantiles", "heavyhitters",
                 "sample", "topk", "minhash", "linreg", "corr"]

#: the ONE stat → default-k map (and, by key set, the list of stats
#: that take a k at all — `lake stats` rejects --k for any other stat,
#: r12 advisor: an ignored --k reads as "I sized a sketch" when the
#: stat has none). One shared default number across stats would be
#: wrong: k is sketch size / sample capacity / n_hashes depending on
#: the stat, and it is a merge contract.
_K_DEFAULTS = {"quantiles": 4096, "heavyhitters": 1024,
               "sample": 64, "topk": 16, "minhash": 16}


def _parse_quantiles(raw: str) -> tuple[float, ...] | str:
    """Pre-parse ``--quantiles`` in the PURE-ARGUMENT phase: a tuple on
    success, an error MESSAGE on failure. The finalizer used to parse
    it lazily — AFTER the state commit — so a trailing comma crashed
    the command post-commit and a retry double-folded the delta into
    the non-idempotent cumulative state (review finding; violates the
    checks-before-Spark contract this file documents)."""
    try:
        qs = tuple(float(q) for q in raw.split(",") if q.strip() != "")
    except ValueError:
        return f"--quantiles {raw!r} is not a comma-separated float list"
    if not qs:
        return f"--quantiles {raw!r} contains no values"
    bad = [q for q in qs if not (0.0 <= q <= 1.0)]
    if bad:
        return f"--quantiles values must be in [0, 1], got {bad}"
    return qs


def _require_quantiles(args: argparse.Namespace) -> tuple[float, ...]:
    """Finalize-time accessor: commands validated this in their
    pure-argument phase, so a failure here is a programming error."""
    qs = _parse_quantiles(args.quantiles)
    assert not isinstance(qs, str), qs
    return qs


def _stat_finalizers(args: argparse.Namespace,
                     corr_cols: tuple | None = None) -> dict:
    """The ONE stat-name → finalizer map shared by ``lake stats`` and
    ``lake stats-show`` (same drift hazard as :func:`_stat_merges`).
    ``args`` supplies the quantile list. ``corr_cols`` carries corr's
    feature columns when the caller parsed them from the
    ``corr:<a+b+...>`` stat form (r12 verdict #5 — multi-stat corr);
    when None, corr falls back to reading ``--value`` as its comma
    list (bare single-stat corr, and stats-show, unchanged)."""
    from polymarket_data_ingestor_spark.operators.analytics import (
        finalize_corr_rollup,
        finalize_distinct_rollup,
        finalize_heavy_hitters,
        finalize_linreg_rollup,
        finalize_minhash_rollup,
        finalize_quantile_rollup,
        finalize_rollup,
        finalize_sample_rollup,
        finalize_topk_rollup,
    )

    return {
        "summary": finalize_rollup,
        "distinct": finalize_distinct_rollup,
        "quantiles": lambda s: finalize_quantile_rollup(
            s, _require_quantiles(args)
        ),
        "heavyhitters": finalize_heavy_hitters,
        "sample": finalize_sample_rollup,
        "topk": finalize_topk_rollup,
        "minhash": finalize_minhash_rollup,
        "linreg": finalize_linreg_rollup,
        # corr's cols come from corr_cols (the corr:<a+b> stat form)
        # or --value (bare corr / stats-show); evaluated lazily, so
        # commands without --value (stats-show on other stats) never
        # touch it
        "corr": lambda s: finalize_corr_rollup(
            s, corr_cols if corr_cols is not None
            else tuple(c for c in args.value.split(",") if c)
        ),
    }


def _display_cols(df) -> list[str]:
    """Printable columns of a finalized state — sketch payloads
    (binary/array cells) are state, not display; shared by every
    stats-printing command."""
    return [
        f.name for f in df.schema.fields
        if f.dataType.typeName() not in ("binary", "array")
    ]


def cmd_lake_compact(args: argparse.Namespace) -> int:
    from polymarket_data_ingestor_spark.sinks import compact_lake_partitions

    spark = get_spark(app_name="pdi-lake-compact")
    n = compact_lake_partitions(
        spark, args.path, _pcols(args),
        partition_filter=args.partition_filter,
    )
    print(f"compacted {n} partition(s) in {args.path}")
    return 0


def cmd_lake_delete(args: argparse.Namespace) -> int:
    from polymarket_data_ingestor_spark.sinks import delete_from_lake

    spark = get_spark(app_name="pdi-lake-delete")
    ids = spark.read.parquet(args.ids_parquet)
    n = delete_from_lake(spark, args.path, ids, args.id_col, _pcols(args))
    print(f"rewrote {n} partition(s) in {args.path}")
    return 0


def cmd_lake_upsert(args: argparse.Namespace) -> int:
    from polymarket_data_ingestor_spark.sinks import upsert_lake_partitions

    spark = get_spark(app_name="pdi-lake-upsert")
    updates = spark.read.parquet(args.updates_parquet)
    n = upsert_lake_partitions(
        spark, args.path, updates,
        tuple(k for k in args.key_cols.split(",") if k),
        _pcols(args),
    )
    print(f"merged into {n} partition(s) in {args.path}")
    return 0


def cmd_lake_expire(args: argparse.Namespace) -> int:
    from polymarket_data_ingestor_spark.sinks import expire_lake_partitions

    pcols = _pcols(args)
    if not pcols:
        print("lake-expire: --partition-cols must name the partition "
              "column to expire on", file=sys.stderr)
        return 2
    if len(pcols) > 1:
        # expiry compares only the FIRST (outermost) level; silently
        # ignoring the rest would read as "expired on all of them"
        print("lake-expire: expiry supports exactly one partition "
              f"column, got {','.join(pcols)} — pass the outermost "
              "level only", file=sys.stderr)
        return 2
    spark = get_spark(app_name="pdi-lake-expire")
    gone = expire_lake_partitions(
        spark, args.path, args.older_than,
        partition_col=pcols[0], dry_run=args.dry_run,
    )
    verb = "would expire" if args.dry_run else "expired"
    print(f"{verb} {len(gone)} partition(s): {', '.join(gone) or '-'}")
    return 0


def cmd_lake_stats(args: argparse.Namespace) -> int:
    """Maintain a mergeable rollup over a lake INCREMENTALLY from the
    shell: fold one delta (a parquet path — typically today's
    partition) into a stored state directory and print the finalized
    statistics. Cost ∝ delta + state keys, never the history — the
    CLI face of the monoid family; each run reads the latest committed
    ``v=N`` under ``--state``, merges the delta, and commits ``v=N+1``
    (predecessors GC'd only AFTER the new version's ``_SUCCESS`` lands)
    — the same MVCC pattern as ``live_materialize``, so a failure
    mid-write can never destroy the accumulated history the way a
    read-merge-overwrite of one path would. A pre-versioned flat state
    directory is folded once as the implicit predecessor and its files
    retired after ``v=1`` commits.

    ``--stat`` accepts a comma list (r11 verdict #5): an operator
    maintaining summary+quantiles+topk over the same lake folds all
    three off ONE cached delta scan instead of paying one delta read
    per stat. With multiple stats, ``--state`` is the PARENT directory
    and each stat's state lands at ``<state>/<stat>`` (with one stat
    the directory is used as-is — unchanged contract). corr joins a
    multi-stat list as ``corr:<col_a+col_b[+...]>`` (r12 verdict #5):
    the suffix carries its feature-column list, freeing ``--value``
    for the other stats' single-column reading; the bare ``corr``
    form (``--value`` as the comma list, single-stat only) is
    unchanged."""
    from polymarket_data_ingestor_spark.operators.analytics import (
        corr_rollup_state,
        heavy_hitters_state,
        linreg_rollup_state,
        minhash_rollup_state,
        quantile_rollup_state,
        rollup_state,
        sample_rollup_state,
        topk_rollup_state,
        distinct_rollup_state,
    )

    keys = tuple(k for k in args.keys.split(",") if k)
    if not keys:
        print("lake stats: --keys must name at least one column",
              file=sys.stderr)
        return 2
    # --stat tokens are <name> or (corr only) corr:<col_a+col_b[+...]>
    # — the suffixed form frees --value for the other stats, so corr
    # can ride the same one cached delta scan (r12 verdict #5)
    stats: list[str] = []
    corr_cols: tuple | None = None
    for tok in (s for s in args.stat.split(",") if s):
        base, sep, suffix = tok.partition(":")
        if sep:
            if base != "corr":
                print(f"lake stats: only corr takes a :<cols> suffix "
                      f"(corr:<col_a+col_b[+...]>); got {tok!r}",
                      file=sys.stderr)
                return 2
            cols = tuple(c for c in suffix.split("+") if c)
            if len(cols) < 2:
                print("lake stats: corr:<col_a+col_b[+...]> needs at "
                      "least two feature columns", file=sys.stderr)
                return 2
            corr_cols = cols
        stats.append(base)
    bad = [s for s in stats if s not in _STAT_CHOICES]
    if not stats or bad:
        print(f"lake stats: --stat must be a comma list from "
              f"{{{','.join(_STAT_CHOICES)}}}"
              + (f"; got {','.join(bad)}" if bad else ""),
              file=sys.stderr)
        return 2
    if len(stats) != len(set(stats)):
        print("lake stats: --stat lists a stat twice", file=sys.stderr)
        return 2
    # every stat consumes --value except the suffixed corr form,
    # which carries its columns in the stat token itself
    needs_value = [s for s in stats
                   if not (s == "corr" and corr_cols is not None)]
    if needs_value and not args.value:
        print("lake stats: --value is required for "
              f"{','.join(needs_value)}", file=sys.stderr)
        return 2
    if args.retain_versions < 1:
        print("lake stats: --retain-versions must be >= 1",
              file=sys.stderr)
        return 2
    if args.state_files < 1:
        print("lake stats: --state-files must be >= 1",
              file=sys.stderr)
        return 2
    # pure-argument checks BEFORE the Spark session: a bad invocation
    # should fail instantly, not after JVM startup + a delta read
    if "topk" in stats and not args.score:
        print("lake stats: --stat topk needs --score <column>",
              file=sys.stderr)
        return 2
    if "linreg" in stats and not args.x:
        print("lake stats: --stat linreg needs --x <column> (the "
              "regressor; --value is y)", file=sys.stderr)
        return 2
    if "corr" in stats and corr_cols is None:
        # BARE corr re-purposes --value as a COMMA LIST of feature
        # columns; that conflicts with every other stat's
        # single-column reading, so the bare form folds alone — the
        # corr:<a+b> form above is how corr joins a multi-stat fold
        if len(stats) > 1:
            print("lake stats: bare corr uses --value as a comma "
                  "list of feature columns and cannot combine with "
                  "other stats — use corr:<col_a+col_b[+...]> in the "
                  "--stat list instead", file=sys.stderr)
            return 2
        corr_cols = tuple(c for c in args.value.split(",") if c)
        if len(corr_cols) < 2:
            print("lake stats: --stat corr needs --value "
                  "<col_a,col_b[,...]> (at least two feature columns)",
                  file=sys.stderr)
            return 2
    if len(stats) > 1 and args.k is not None:
        # k means incompatible things per stat (sketch size vs sample
        # capacity vs n_hashes) and a wrong one silently commits a
        # state no default-parameter caller can ever fold again (the
        # (k, seed) contract refusal fires on the NEXT fold, after
        # the damage) — the per-stat defaults exist precisely because
        # one shared number is wrong (r12 review)
        print("lake stats: --k with multiple stats is ambiguous "
              "(k is sketch size / capacity / n_hashes depending on "
              "the stat) — fold the stat that needs a custom k "
              "separately", file=sys.stderr)
        return 2
    if len(stats) == 1 and args.k is not None \
            and stats[0] not in _K_DEFAULTS:
        # an ignored --k reads as "I sized a sketch" when the stat has
        # none (summary/distinct/linreg/corr) — refuse, mirroring the
        # multi-stat ambiguity check (r12 advisor)
        print(f"lake stats: --stat {stats[0]} takes no --k "
              f"(only {','.join(sorted(_K_DEFAULTS))} size a sketch) "
              "— remove --k", file=sys.stderr)
        return 2
    if "quantiles" in stats:
        # pure-argument phase by contract: the finalizer runs AFTER the
        # state commit, so a parse failure there crashes post-commit
        # and a retry double-folds the delta (review finding)
        qs = _parse_quantiles(args.quantiles)
        if isinstance(qs, str):
            print(f"lake stats: {qs}", file=sys.stderr)
            return 2
    if args.label is None and (args.window is not None
                               or args.retain_labels is not None):
        print("lake stats: --window/--retain-labels need --label "
              "(windowed mode)", file=sys.stderr)
        return 2
    if args.label is not None:
        # the ONE shared predicate (live.validate_state_label) — a
        # diverging local copy would let a label pass this cheap guard
        # and traceback after JVM startup
        from polymarket_data_ingestor_spark.streaming.live import (
            validate_state_label,
        )

        try:
            validate_state_label(args.label)
        except ValueError as e:
            print(f"lake stats: {e}", file=sys.stderr)
            return 2
    if args.window is not None and args.window < 1:
        print("lake stats: --window must be >= 1", file=sys.stderr)
        return 2
    if args.retain_labels is not None and args.retain_labels < 1:
        print("lake stats: --retain-labels must be >= 1",
              file=sys.stderr)
        return 2
    if args.show < 0:
        print("lake stats: --show must be >= 0", file=sys.stderr)
        return 2
    spark = get_spark(app_name="pdi-lake-stats")
    delta = spark.read.parquet(args.delta)

    def _build(stat, d):
        # per-stat library defaults (_K_DEFAULTS) — one shared number
        # would silently build sample states no API-default caller
        # could ever fold (the (k, seed) contract refuses mixed
        # capacities)
        k = args.k if args.k is not None else _K_DEFAULTS.get(stat)
        return {
            "summary": lambda: rollup_state(d, keys, args.value),
            "distinct": lambda: distinct_rollup_state(
                d, keys, args.value),
            "quantiles": lambda: quantile_rollup_state(
                d, keys, args.value, k=k),
            "heavyhitters": lambda: heavy_hitters_state(
                d, keys, args.value, k=k),
            "sample": lambda: sample_rollup_state(
                d, keys, args.value, k=k, seed=args.seed),
            "topk": lambda: topk_rollup_state(
                d, keys, args.value, args.score, k=k),
            "minhash": lambda: minhash_rollup_state(
                d, keys, args.value, n_hashes=k, seed=args.seed),
            "linreg": lambda: linreg_rollup_state(
                d, keys, args.x, args.value),
            "corr": lambda: corr_rollup_state(d, keys, corr_cols),
        }[stat]()

    from polymarket_data_ingestor_spark.streaming.live import (
        _rollup_versions,
        state_labels,
    )

    state_dirs = {
        stat: (args.state if len(stats) == 1
               else f"{args.state.rstrip('/')}/{stat}")
        for stat in stats
    }
    # A state directory's layout is a CONTRACT like its (k, seed): one
    # accidental fold in the other mode would create a dual-layout dir
    # where stats-show's auto-detect (d= labels win) silently shadows
    # the entire accumulated cumulative history — refuse loudly
    # instead (r11 ADVICE). Validated for EVERY stat BEFORE the first
    # fold (r12 review): cumulative folds are not idempotent, so a
    # mid-loop refusal after earlier stats committed would make the
    # natural "fix and re-run" double-fold the delta into them.
    for stat in stats:
        sd = state_dirs[stat]
        if args.label is not None and _rollup_versions(spark, sd):
            print(f"lake stats: {sd} is a cumulative (v=N) "
                  "state directory — a labeled fold into it would "
                  "shadow the accumulated history in read-only "
                  "queries; drop --label or use a fresh directory",
                  file=sys.stderr)
            return 2
        if args.label is None and state_labels(spark, sd):
            print(f"lake stats: {sd} is a labeled (d=<label>) "
                  "state directory — a cumulative fold into it would "
                  "create a dual-layout dir; pass --label or use a "
                  "fresh directory", file=sys.stderr)
            return 2

    if len(stats) > 1:
        # the point of the comma list: ONE delta scan feeds every
        # stat's state build (the first build materializes the cache;
        # the rest read InMemoryTableScan, never the parquet again)
        delta = delta.persist()
    def _partial_commit_note(i: int) -> None:
        # predictable failures are pre-validated above; a residual
        # mid-loop failure (e.g. a (k, seed) merge contract refusal
        # against an existing state, surfacing as an EXCEPTION from
        # the commit's write action) leaves EARLIER stats committed —
        # and because the COMMIT precedes the finalize/print inside
        # _fold_one_lake_stat, stat i ITSELF may have committed too
        # before a display-path failure (review finding: the old note
        # told the operator to re-run stat i, steering a double-fold).
        # Cumulative folds are not idempotent, so be precise:
        done = ",".join(stats[:i]) or "(none)"
        rest = ",".join(stats[i + 1:])
        print("lake stats: stats before the failure "
              f"({done}) COMMITTED this delta; the failing stat "
              f"'{stats[i]}' may ALSO have committed before the "
              "failure — check its version/label with stats-show "
              "before re-folding it"
              + (f"; the remaining stats ({rest}) did not run"
                 if rest else ""),
              file=sys.stderr)

    try:
        for i, stat in enumerate(stats):
            try:
                rc = _fold_one_lake_stat(
                    spark, args, stat, state_dirs[stat], keys,
                    _build(stat, delta),
                    _stat_finalizers(args, corr_cols=corr_cols)[stat],
                    _stat_merges()[stat],
                )
            except Exception:
                _partial_commit_note(i)
                raise
            if rc != 0:
                _partial_commit_note(i)
                return rc
    finally:
        if len(stats) > 1:
            delta.unpersist()
    return 0


def _fold_one_lake_stat(spark, args, stat, state_dir, keys, state,
                        finalize, _merge_fn) -> int:
    """One stat's fold+report against one state directory — the body
    of ``lake stats``, factored so the multi-stat loop shares the
    cached delta (r11 verdict #5) while the labeled/cumulative logic
    stays the ONE copy. Layout validation happened in the caller's
    pre-pass (all stats, before any fold)."""
    from polymarket_data_ingestor_spark.streaming.live import (
        _rollup_versions,
        commit_rollup_version,
        expire_state_labels,
        fold_labeled_state,
        read_window_state,
        state_labels,
    )

    def merge(*st):
        return _merge_fn(*st, keys=keys)

    if args.label is not None:
        # LABELED (windowed) mode: this delta's own state lands under
        # d=<label> — a pure function of the delta, so a re-fold of
        # the same label is idempotent with no predecessor read — and
        # the answer is the merge of the last --window labels. This is
        # how "last N days" works for monoids with no subtraction
        # (min/max, sketches, bottom-k/top-k): keep per-label states,
        # merge the window at read. Retention via --retain-labels.
        if args.retain_labels is not None:
            # BEFORE committing: a backfill label older than the
            # retention window would be committed and then immediately
            # expired by the post-commit retention pass — while still
            # printing 'committed' (review finding). One listing,
            # refuse up front with nothing written.
            existing = state_labels(spark, state_dir)
            kept = sorted(set(existing) | {args.label})[
                -args.retain_labels:
            ]
            if args.label not in kept:
                print(
                    f"lake stats: label {args.label} sorts below the "
                    f"--retain-labels {args.retain_labels} window "
                    f"(newest: {existing[-1]}) — the backfill would be "
                    f"expired the moment it commits; re-run without "
                    f"--retain-labels to keep it",
                    file=sys.stderr,
                )
                return 2
        fold_labeled_state(spark, state_dir, args.label, state,
                           n_files=args.state_files)
        if args.retain_labels is not None:
            gone = expire_state_labels(spark, state_dir,
                                       args.retain_labels)
            if gone:
                print(f"expired {len(gone)} label(s): "
                      f"{', '.join(gone)}")
        # ONE listing feeds both the merge and the report (the
        # two-listing hazard read_window_state's docstring warns
        # about): a concurrent fold/expire between two listings would
        # make the printed window disagree with what was merged —
        # fewer labels than --window asked for must ALSO not read as
        # a full window, hence reporting len(merged)
        merged = state_labels(spark, state_dir)
        if args.window is not None:
            merged = merged[-args.window:]
        state = read_window_state(spark, state_dir, merge,
                                  labels=merged)
        # persist: unlike the cumulative branch there is no committed
        # merged artifact to re-read, and the display collect + the
        # key count below would otherwise run the window merge twice
        state = state.persist()
        try:
            out = finalize(state)
            for row in (out.select(*_display_cols(out))
                        .limit(args.show).collect()):
                print(row.asDict())
            print(f"state: {state_dir}/d={args.label} committed; "
                  f"window: {len(merged)} label(s) "
                  f"[{merged[0]}..{merged[-1]}], {state.count()} keys")
        finally:
            state.unpersist()
        return 0

    # Versioned commit via the ONE shared MVCC sequence
    # (live.py::commit_rollup_version, same as live_materialize): read
    # latest v=N, write v=N+1, GC predecessors only after the new
    # _SUCCESS exists. Never read-then-overwrite one path — a failure
    # mid-write there destroys every previously folded delta. (The
    # labeled-dir layout refusal ran in the caller's pre-pass.)
    versions = _rollup_versions(spark, state_dir)
    # Legacy (pre-versioned flat) files at the root, listed on EVERY
    # run: retirement happens after a successful commit, so a crash in
    # the window between a commit and the deletes must be retried by
    # the next fold, not orphaned next to the v=N dirs forever (where
    # a flat read of the root would union the stale pre-migration
    # aggregates back in). Root FILES only, via Hadoop FS — a
    # directory read would partition-discover a torn v=1 left by a
    # crashed first fold and double-fold its partial write.
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    legacy_files = (
        [st.getPath() for st in fs.listStatus(root) if st.isFile()]
        if fs.exists(root) else []
    )
    if versions:
        # legacy data (if any still lingers) was folded by the run
        # that committed v=1 — fold from the committed state only
        state = merge(
            spark.read.parquet(f"{state_dir}/v={versions[-1]}"), state
        )
    else:
        data = [p.toString() for p in legacy_files
                if not p.getName().startswith(("_", "."))]
        if data:
            # fold the flat layout once as the implicit predecessor
            state = merge(spark.read.parquet(*data), state)
    # The write lands in a NEW directory, so the lineage reading v=N
    # (or the legacy files) stays valid — no checkpoint needed.
    new_v = (versions[-1] + 1) if versions else 1
    commit_rollup_version(spark, state_dir, state, new_v,
                          versions, args.retain_versions,
                          n_files=args.state_files)
    for p in legacy_files:  # retire AFTER the commit, every run
        if "_compact_d=" in p.getName():
            # a pending label-compaction recovery manifest is NOT
            # legacy residue — deleting it would brick that recovery
            continue
        fs.delete(p, False)
    state = spark.read.parquet(f"{state_dir}/v={new_v}")
    out = finalize(state)
    for row in out.select(*_display_cols(out)).limit(args.show).collect():
        print(row.asDict())
    # print the COMMITTED version path — a flat read of the root would
    # union every retained version (read_rollup_state is the reader)
    print(f"state: {state_dir}/v={new_v} ({state.count()} keys)")
    return 0


def cmd_lake_stats_show(args: argparse.Namespace) -> int:
    """Read-only query of an existing monoid state — what a dashboard
    or operator runs between folds. Detects the layout: ``d=<label>``
    dirs → windowed read (merge the newest ``--window`` labels, or
    exactly ``--label`` for one-day inspection — the read-only parity
    of the fold path's flags, r11 verdict #8); ``v=N`` dirs → the
    latest committed cumulative version; neither → error. Never
    writes."""
    from polymarket_data_ingestor_spark.streaming.live import (
        _rollup_versions,
        read_rollup_state,
        read_window_state,
        state_labels,
        validate_state_label,
    )

    keys = tuple(k for k in args.keys.split(",") if k)
    if not keys:
        print("lake stats-show: --keys must name at least one column",
              file=sys.stderr)
        return 2
    if args.window is not None and args.window < 1:
        print("lake stats-show: --window must be >= 1", file=sys.stderr)
        return 2
    if args.label is not None and args.window is not None:
        print("lake stats-show: --label reads exactly one label; it "
              "excludes --window", file=sys.stderr)
        return 2
    if args.label is not None:
        try:
            validate_state_label(args.label)
        except ValueError as e:
            print(f"lake stats-show: {e}", file=sys.stderr)
            return 2
    if args.show < 0:
        print("lake stats-show: --show must be >= 0", file=sys.stderr)
        return 2
    if args.stat == "corr" and (
        args.value is None
        or len([c for c in args.value.split(",") if c]) < 2
    ):
        print("lake stats-show: --stat corr needs --value "
              "<col_a,col_b[,...]> (the columns the state was built "
              "over)", file=sys.stderr)
        return 2
    if args.stat == "quantiles":
        qs = _parse_quantiles(args.quantiles)
        if isinstance(qs, str):
            print(f"lake stats-show: {qs}", file=sys.stderr)
            return 2
    finalize = _stat_finalizers(args)[args.stat]
    mfn = _stat_merges()[args.stat]
    spark = get_spark(app_name="pdi-lake-stats-show")
    labels = state_labels(spark, args.state)
    if labels:
        # ONE listing feeds both the merge and the report — a second
        # listing inside read_window_state could disagree with what a
        # concurrent fold/expire left by the time we print
        if args.label is not None:
            if args.label not in labels:
                print(f"lake stats-show: no committed label "
                      f"d={args.label} under {args.state} "
                      f"(have: {', '.join(labels)})", file=sys.stderr)
                return 1
            shown = [args.label]
        elif args.window is not None:
            shown = labels[-args.window:]
        else:
            shown = labels
        state = read_window_state(
            spark, args.state,
            lambda *st: mfn(*st, keys=keys),
            labels=shown,
        )
        where = f"window: {len(shown)} label(s) [{shown[0]}..{shown[-1]}]"
    else:
        versions = _rollup_versions(spark, args.state)
        if not versions:
            print(f"lake stats-show: no committed state under "
                  f"{args.state}", file=sys.stderr)
            return 1
        if args.window is not None or args.label is not None:
            print("lake stats-show: --window/--label need a LABELED "
                  "state (d=<label> dirs); this one is cumulative "
                  "(v=N)", file=sys.stderr)
            return 2
        state = read_rollup_state(spark, args.state)
        where = f"cumulative v={versions[-1]}"
    out = finalize(state)
    for row in out.select(*_display_cols(out)).limit(args.show).collect():
        print(row.asDict())
    print(f"state: {args.state} ({where})")
    return 0


def cmd_lake_compact_labels(args: argparse.Namespace) -> int:
    """Hierarchical window maintenance from the shell: merge a range
    of committed ``d=<label>`` states into one coarser label (31
    dailies → a month) and retire the sources — so long windows stay
    a handful of keys-sized states. Crash-safe and resumable (see
    ``compact_state_labels``); re-run the same command after any
    failure."""
    from polymarket_data_ingestor_spark.streaming.live import (
        compact_state_labels,
        validate_state_label,
    )

    keys = tuple(k for k in args.keys.split(",") if k)
    labels = [lb.strip() for lb in args.labels.split(",") if lb.strip()]
    if not keys or not labels:
        print("lake compact-labels: --keys and --labels must be "
              "non-empty", file=sys.stderr)
        return 2
    try:
        validate_state_label(args.into)
    except ValueError as e:
        print(f"lake compact-labels: {e}", file=sys.stderr)
        return 2
    mfn = _stat_merges()[args.stat]
    spark = get_spark(app_name="pdi-lake-compact-labels")
    try:
        action, removed = compact_state_labels(
            spark, args.state, labels, args.into,
            lambda *st: mfn(*st, keys=keys),
            contract=f"{args.stat}/{','.join(keys)}",
        )
    except ValueError as e:
        print(f"lake compact-labels: {e}", file=sys.stderr)
        return 1
    # report what ACTUALLY happened — a resume that only finished
    # leftover deletes must not read as a fresh merge
    print(f"{action}: {args.state}/d={args.into}; removed "
          f"{len(removed)} source label(s)"
          + (f": {', '.join(removed)}" if removed else ""))
    return 0


def cmd_lake_bloom(args: argparse.Namespace) -> int:
    """Size the streaming-dedup bloom front: print the ``bloom_bits``
    for an expected corpus at a target false-positive rate (geometry
    is a lake-lifetime contract — see ``bloom_geometry``). Pure math,
    no Spark session."""
    from polymarket_data_ingestor_spark.streaming import bloom_geometry

    try:
        m = bloom_geometry(args.digests, args.fp)
    except ValueError as e:
        print(f"lake bloom: {e}", file=sys.stderr)
        return 2
    print(f"bloom_bits: {m}")
    print(f"bytes: {m // 8} (~{m / 8 / 2 ** 20:.1f} MiB)")
    print(f"bits/digest: {m / args.digests:.2f} at fp<={args.fp}")
    return 0


def cmd_manifests(args: argparse.Namespace) -> int:
    from polymarket_data_ingestor_spark.operators.replay import (
        write_gate_manifests,
    )

    paths = _resolve_paths(args.data_dir, None, None, None)
    if not paths:
        print("no log files found", file=sys.stderr)
        return 1
    spark = get_spark(app_name="pdi-manifests")
    n = write_gate_manifests(spark, paths)
    print(f"wrote {n} manifest sidecar(s) in {args.data_dir}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="polymarket_data_ingestor_spark",
        description="PySpark-native Polymarket order-book analytics engine",
    )
    sub = p.add_subparsers(dest="command", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--data-dir", default="data/raw",
                        help="directory of hourly .jsonl[.zst|.gz] logs")
    common.add_argument("-t", "--time-range", default=None,
                        help="duration like 24h / 2d (end = last full hour)")
    common.add_argument("--start", default=None, help="range start timestamp")
    common.add_argument("--end", default=None, help="range end timestamp")

    r = sub.add_parser("replay", parents=[common],
                       help="raw logs -> tick parquet")
    r.add_argument("-o", "--output", default="ticks.parquet")
    r.add_argument("--markets", default=None,
                   help="comma-separated market (condition) ids to keep")
    r.add_argument("--log-order", action="store_true",
                   help="globally sort output in exact log order")
    r.set_defaults(fn=cmd_replay)

    m = sub.add_parser("markets", parents=[common],
                       help="inspect the active_markets dimension")
    m.add_argument("filter", nargs="?", default=None,
                   help="case-insensitive question substring")
    m.add_argument("--format", choices=["pretty", "csv", "json"],
                   default="pretty")
    m.add_argument("-o", "--output", default=None,
                   help="write CSV here instead of stdout")
    m.set_defaults(fn=cmd_markets)

    c = sub.add_parser("collect",
                       help="live WebSocket collection -> framed JSONL logs")
    c.add_argument("--out-dir", default="data/raw",
                   help="directory for hourly log files")
    c.add_argument("--markets-file", default=None,
                   help="JSON list of markets (skips the REST fetch)")
    c.add_argument("--sampling", action="store_true",
                   help="use the sampling-markets endpoint")
    c.add_argument("--compress", action="store_true",
                   help="gzip the log files")
    c.set_defaults(fn=cmd_collect)

    lk = sub.add_parser("lake", help="partitioned-lake maintenance")
    lk_sub = lk.add_subparsers(dest="lake_command", required=True)
    lk_common = argparse.ArgumentParser(add_help=False)
    lk_common.add_argument("path", help="lake root directory")
    lk_common.add_argument("--partition-cols", default="dt",
                           help="comma-separated partition columns")

    lc = lk_sub.add_parser("compact", parents=[lk_common],
                           help="collapse small files per partition")
    lc.add_argument("--partition-filter", default=None,
                    help="SQL predicate over partition cols "
                         "(directory-level pruning)")
    lc.set_defaults(fn=cmd_lake_compact)

    ld = lk_sub.add_parser("delete", parents=[lk_common],
                           help="delete rows by key (takedown)")
    ld.add_argument("--ids-parquet", required=True,
                    help="parquet file/dir of target ids")
    ld.add_argument("--id-col", required=True)
    ld.set_defaults(fn=cmd_lake_delete)

    lu = lk_sub.add_parser("upsert", parents=[lk_common],
                           help="MERGE a keyed batch into the lake")
    lu.add_argument("--updates-parquet", required=True,
                    help="parquet file/dir of update rows "
                         "(must carry the partition columns)")
    lu.add_argument("--key-cols", required=True,
                    help="comma-separated key columns")
    lu.set_defaults(fn=cmd_lake_upsert)

    le = lk_sub.add_parser("expire", parents=[lk_common],
                           help="drop partitions older than a cutoff "
                                "(retention; listing-only, no scan)")
    le.add_argument("--older-than", required=True,
                    help="cutoff value; partitions sorting strictly "
                         "below it are removed (ISO dates/hours)")
    le.add_argument("--dry-run", action="store_true",
                    help="report what would be removed, delete nothing")
    le.set_defaults(fn=cmd_lake_expire)

    ls = lk_sub.add_parser(
        "stats",
        help="fold a delta into a mergeable rollup state and print "
             "the finalized statistics (cost ~ delta + state keys, "
             "never the history)",
    )
    ls.add_argument("delta", help="parquet path of the NEW rows to fold")
    ls.add_argument("--state", required=True,
                    help="state directory (created on first run)")
    ls.add_argument("--stat", required=True,
                    help=f"one of {{{','.join(_STAT_CHOICES)}}}, or a "
                    "comma list to fold several states off ONE cached "
                    "delta scan (then --state is the parent dir and "
                    "each stat lands at <state>/<stat>); corr joins a "
                    "multi-stat list as corr:<col_a+col_b[+...]> — "
                    "the suffix carries its feature columns so "
                    "--value stays the other stats' single column")
    ls.add_argument("--keys", required=True,
                    help="comma-separated group columns")
    ls.add_argument("--value", default=None,
                    help="value column (item column for heavyhitters/"
                         "minhash, counted column for distinct, id "
                         "column for sample/topk; comma list of "
                         "feature columns for bare corr) — required "
                         "unless the only stat is corr:<cols>")
    ls.add_argument("--score", default=None,
                    help="score column for --stat topk (items ranked "
                         "score DESC, id ASC)")
    ls.add_argument("--k", type=int, default=None,
                    help="sketch/sample capacity (n_hashes for "
                         "minhash); defaults follow the library per "
                         "stat (quantiles 4096, heavyhitters 1024, "
                         "sample 64, topk 16, minhash 16) — k is a "
                         "merge contract, so folds into an existing "
                         "state must reuse its k")
    ls.add_argument("--seed", type=int, default=1,
                    help="hash seed for --stat sample/minhash (part "
                         "of the state's merge contract, like --k)")
    ls.add_argument("--x", default=None,
                    help="for --stat linreg: the regressor column "
                    "(--value is y; must fit decimal(18,6) — epoch "
                    "SECONDS fit, millis do not)")
    ls.add_argument("--state-files", type=int, default=1,
                    help="files per committed state write (default 1 "
                    "— right for sketch-bounded states; scale it for "
                    "a high-cardinality-key summary/distinct state so "
                    "the commit doesn't funnel through one writer)")
    ls.add_argument("--retain-versions", type=int, default=2,
                    help="committed state versions to keep besides "
                         "the newest (>= 1; cumulative mode)")
    ls.add_argument("--label", default=None,
                    help="windowed mode: store THIS delta's state "
                         "under d=<label> (e.g. an ISO date) instead "
                         "of folding cumulatively — 'last N days' for "
                         "monoids that cannot subtract")
    ls.add_argument("--window", type=int, default=None,
                    help="windowed mode: merge only the newest N "
                         "labels for the printed stats (default all)")
    ls.add_argument("--retain-labels", type=int, default=None,
                    help="windowed mode: delete labels beyond the "
                         "newest N after the fold")
    ls.add_argument("--quantiles", default="0.5,0.9,0.99",
                    help="comma-separated quantiles for --stat quantiles")
    ls.add_argument("--show", type=int, default=20,
                    help="finalized rows to print")
    ls.set_defaults(fn=cmd_lake_stats)

    lss = lk_sub.add_parser(
        "stats-show",
        help="read-only query of an existing monoid state (cumulative "
             "v=N or windowed d=<label> layout, auto-detected)",
    )
    lss.add_argument("state", help="state directory")
    lss.add_argument("--stat", required=True,
                     choices=_STAT_CHOICES)
    lss.add_argument("--keys", required=True,
                     help="comma-separated group columns (must match "
                          "the folds that built the state)")
    lss.add_argument("--window", type=int, default=None,
                     help="labeled states: merge only the newest N "
                          "labels (default all)")
    lss.add_argument("--label", default=None,
                     help="labeled states: read exactly this one "
                          "committed label (excludes --window)")
    lss.add_argument("--value", default=None,
                     help="--stat corr only: the comma list of feature "
                          "columns the state was built over (names the "
                          "finalized output; checked against the "
                          "state's cr_cols contract at execution)")
    lss.add_argument("--quantiles", default="0.5,0.9,0.99",
                     help="comma-separated quantiles for --stat "
                          "quantiles")
    lss.add_argument("--show", type=int, default=20,
                     help="finalized rows to print")
    lss.set_defaults(fn=cmd_lake_stats_show)

    lcl = lk_sub.add_parser(
        "compact-labels",
        help="merge committed d=<label> window states into one "
             "coarser label (31 dailies -> a month) and retire the "
             "sources",
    )
    lcl.add_argument("state", help="labeled state directory")
    lcl.add_argument("--stat", required=True,
                     choices=_STAT_CHOICES)
    lcl.add_argument("--keys", required=True,
                     help="comma-separated group columns (must match "
                          "the folds that built the states)")
    lcl.add_argument("--labels", required=True,
                     help="comma-separated source labels to merge")
    lcl.add_argument("--into", required=True,
                     help="the coarser label to commit")
    lcl.set_defaults(fn=cmd_lake_compact_labels)

    lb = lk_sub.add_parser(
        "bloom",
        help="size the dedup bloom front: bloom_bits for an expected "
             "corpus at a target false-positive rate",
    )
    lb.add_argument("--digests", type=int, required=True,
                    help="corpus digests the bloom must eventually hold")
    lb.add_argument("--fp", type=float, default=0.02,
                    help="target false-positive rate (default 0.02)")
    lb.set_defaults(fn=cmd_lake_bloom)

    mf = sub.add_parser("manifests",
                        help="backfill gate-manifest sidecars for "
                             "existing frame logs")
    mf.add_argument("--data-dir", default="data/raw")
    mf.set_defaults(fn=cmd_manifests)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
