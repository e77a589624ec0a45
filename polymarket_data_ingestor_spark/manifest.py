"""Per-file gate manifests: ingest-time skew statistics as sidecars.

The replay skew gate needs one number per frame-log file set — the
maximum per-(asset, file) book-event count — to decide whether the
snapshot-split machinery has anything to split (operators/replay.py).
Computing it at query time costs a raw-text scan of the lake per
process; at 100 TB that is a real job. The scan result is a property of
the file (hourly logs are immutable once rotated — the collector's
contract, reference ``collector/src/main.rs`` hourly rotation), so the
RIGHT place to compute it is ingest time, once, at rotation: the writer
already has every line in hand.

This module is the shared, dependency-light (no Spark import) contract
between the writer side (``streaming.collector.FrameWriter`` emits a
sidecar at every rotation; ``operators.replay.write_gate_manifests``
backfills a warm lake) and the reader side
(``operators.replay._max_snapshot_cell`` prefers sidecars and falls
back to the raw scan for files that lack them).

Format: ``.<file>.manifest.json`` next to the data file (leading dot:
Spark's file sources ignore hidden ``.``/``_`` paths, so a directory or
glob read of the frame lake can never ingest a sidecar as data — the
same convention as ``_SUCCESS`` markers) —

    {"version": 1, "file_size": <bytes of the data file>,
     "max_book_count": N, "book_counts": {"<asset_id>": n, ...}}

``file_size`` + ``file_mtime_ns`` are the staleness check: a manifest
whose recorded size OR mtime differs from the file on disk is ignored
(the file was rewritten — mtime catches the same-byte-length rewrite
that size alone cannot), and the gate falls back to scanning that
file. Pre-r9 sidecars lack the mtime field and validate size-only. The counts use the gate's
exact over-approximation semantics — every LINE containing the
substring ``book`` contributes one count to every asset_id it mentions
— so sidecar and scan agree byte-for-byte and over-counting only ever
errs toward running the split machinery, never toward missing skew.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

#: Matches an ``asset_id`` key/value inside a frame line. The frame's
#: ``content`` field is a double-encoded JSON string, so the inner
#: quotes arrive escaped (``\"asset_id\": \"123...\"``) — the ``\\?``
#: prefixes accept both the escaped (inner) and bare single-encoded
#: forms. The SAME pattern string drives the Spark-side raw scan
#: (``regexp_extract_all``, Java regex) and the writer-side Python
#: counting; it is deliberately limited to syntax both engines read
#: identically.
ASSET_ID_RE = r'\\?"asset_id\\?"\s*:\s*\\?"(\d+)'

_ASSET_ID_PY = re.compile(ASSET_ID_RE)

MANIFEST_SUFFIX = ".manifest.json"
MANIFEST_VERSION = 1


def manifest_path(file_path: str | Path) -> Path:
    p = Path(file_path)
    return p.parent / ("." + p.name + MANIFEST_SUFFIX)


def count_book_assets(line: str, counts: dict[str, int]) -> None:
    """Accumulate the gate statistic for one raw log line: if the line
    contains the substring ``book`` (any JSON encoding of
    ``"event_type": "book"`` does), count every asset_id it mentions.
    Mirrors the Spark raw-scan exactly."""
    if "book" in line:
        for asset in _ASSET_ID_PY.findall(line):
            counts[asset] = counts.get(asset, 0) + 1


def write_manifest(
    file_path: str | Path, book_counts: dict[str, int]
) -> Path:
    """Write the sidecar for a (just-rotated, now-immutable) data file."""
    p = Path(file_path)
    out = manifest_path(p)
    st = p.stat()
    doc = {
        "version": MANIFEST_VERSION,
        "file_size": st.st_size,
        "file_mtime_ns": st.st_mtime_ns,
        "max_book_count": max(book_counts.values(), default=0),
        "book_counts": dict(sorted(book_counts.items())),
    }
    tmp = out.with_suffix(out.suffix + ".tmp")
    tmp.write_text(json.dumps(doc))
    tmp.replace(out)  # atomic: readers never see a partial manifest
    return out


def read_manifest_counts(file_path: str | Path) -> dict[str, int] | None:
    """Return the file's full per-asset book counts from its sidecar,
    or None when the sidecar is absent, unreadable, a different
    version, or stale (recorded size != file size — the file was
    rewritten). The full map (not just the max) matters to the gate:
    the replay grouping keys on the hour TOKEN from the file name, so
    counts from multiple files sharing an hour token must be SUMMED
    per asset before taking the max — a per-file max would
    under-approximate exactly the multi-directory skew case."""
    p = Path(file_path)
    mp = manifest_path(p)
    try:
        if not p.is_file() or not mp.is_file():
            return None
        doc = json.loads(mp.read_text())
        if doc.get("version") != MANIFEST_VERSION:
            return None
        st = os.stat(p)
        if doc.get("file_size") != st.st_size:
            return None
        # size alone misses a rewrite to the exact same byte length;
        # mtime_ns catches it. Recorded by every writer since r9 —
        # absent in pre-r9 sidecars, which keep the size-only check
        # (their files were written under the immutable-log contract;
        # re-running the backfill CLI upgrades them). A copy that did
        # not preserve mtime merely falls back to the scan: slower,
        # never wrong.
        if "file_mtime_ns" in doc and doc["file_mtime_ns"] != st.st_mtime_ns:
            return None
        return {str(k): int(v) for k, v in doc["book_counts"].items()}
    except (OSError, ValueError, TypeError, KeyError, AttributeError):
        # AttributeError: book_counts present but not a dict (corrupt /
        # hand-edited sidecar) — same answer as any unreadable sidecar
        return None


def read_manifest_max(file_path: str | Path) -> int | None:
    """Max per-asset book count from the sidecar (None = invalid/stale),
    for single-file consumers; multi-file gates need
    :func:`read_manifest_counts` (see its docstring)."""
    counts = read_manifest_counts(file_path)
    if counts is None:
        return None
    return max(counts.values(), default=0)
