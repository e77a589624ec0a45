"""Time-range → file-path pruning (SURVEY §2.1 S4, §2.8 C3-C5, §2.6 O-s1).

The reference prunes hourly log files by parsing the ``YYYY-MM-DD-HH`` stamp
out of each filename and keeping files whose hour interval overlaps the query
range (``cli/src/file_reader.rs:46-106``), then sorts lexicographically =
chronologically. That is partition pruning done by hand; here it is a small
driver-side helper (on a cluster with ``raw/hour=.../`` layout, Catalyst's
partition pruning replaces it entirely — see SURVEY §4).
"""

from __future__ import annotations

import posixpath
import re
from datetime import datetime, timedelta, timezone

_FILENAME_RE = re.compile(r"^(\d{4}-\d{2}-\d{2}-\d{2})\.jsonl(\.zst|\.gz)?$")
_DURATION_RE = re.compile(r"^(\d+)([smhdw])$")
_DURATION_UNITS = {
    "s": timedelta(seconds=1),
    "m": timedelta(minutes=1),
    "h": timedelta(hours=1),
    "d": timedelta(days=1),
    "w": timedelta(weeks=1),
}

HOUR = timedelta(hours=1)


def parse_timestamp_multi(s: str) -> datetime:
    """Multi-format timestamp parse, mirroring ``cli/src/main.rs:270-287``.

    Fallback chain: RFC3339 with offset → naive ``%Y-%m-%dT%H:%M:%S`` assumed
    UTC → date-only ``%Y-%m-%d`` at midnight UTC. Raises ``ValueError`` when
    nothing matches. (Column-side equivalent: ``coalesce(to_timestamp(...),
    ...)``.)
    """
    s = s.strip()
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        dt = None
    if dt is not None:
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    raise ValueError(f"unrecognized timestamp: {s!r}")


def parse_duration(s: str) -> timedelta:
    """Parse ``"12h"`` / ``"2d"`` style durations (``cli/src/main.rs:243-268``)."""
    m = _DURATION_RE.match(s.strip())
    if not m:
        raise ValueError(f"unrecognized duration: {s!r} (expected e.g. '12h', '2d')")
    return int(m.group(1)) * _DURATION_UNITS[m.group(2)]


def parse_time_range(
    spec: str, now: datetime | None = None
) -> tuple[datetime, datetime]:
    """Duration spec → ``(now - duration, trunc_hour(now) - 1min)``.

    Mirrors the reference's replay default range computation
    (``cli/src/main.rs:243-268``): the end excludes the current (incomplete)
    hour file.
    """
    if now is None:
        now = datetime.now(timezone.utc)
    dur = parse_duration(spec)
    end = now.replace(minute=0, second=0, microsecond=0) - timedelta(minutes=1)
    return now - dur, end


def hour_bucket(dt: datetime) -> str:
    """Hour truncation + filename stamp (``collector/src/main.rs:126-135``)."""
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%d-%H")


def parse_hour_bucket(stamp: str) -> datetime:
    return datetime.strptime(stamp, "%Y-%m-%d-%H").replace(tzinfo=timezone.utc)


def hour_range(start: datetime, end: datetime) -> list[str]:
    """All hour buckets whose [t, t+1h) interval overlaps [start, end].

    Mirrors ``cli/src/gcs_downloader.rs:106-124`` (expected object names for a
    range) and the overlap test at ``cli/src/file_reader.rs:93-98``.
    """
    if start.tzinfo is None:
        start = start.replace(tzinfo=timezone.utc)
    if end.tzinfo is None:
        end = end.replace(tzinfo=timezone.utc)
    cur = start.replace(minute=0, second=0, microsecond=0)
    out: list[str] = []
    while cur < end:
        out.append(hour_bucket(cur))
        cur += HOUR
    return out


def gcs_paths(
    bucket: str,
    start: datetime,
    end: datetime,
    prefix: str = "raw",
    compressed: bool = True,
) -> list[str]:
    """Expected GCS object URLs for a time range (S4).

    Replaces the reference's download-then-read
    (``cli/src/gcs_downloader.rs:39-124``, bucket layout
    ``gs://polymarket-data-bucket/raw/``): Spark reads ``gs://`` directly
    via the GCS connector, so the hour-range → object-name logic is all
    that survives — the local cache and the ``gcloud storage cp``
    subprocess disappear entirely.
    """
    ext = ".jsonl.zst" if compressed else ".jsonl"
    return [
        f"gs://{bucket}/{prefix}/{h}{ext}" for h in hour_range(start, end)
    ]


def discover_files(
    paths: list[str],
    start: datetime | None = None,
    end: datetime | None = None,
) -> list[str]:
    """Prune a candidate file list to the time range, sorted chronologically.

    A file named ``YYYY-MM-DD-HH.jsonl[.zst]`` covers ``[file_time,
    file_time + 1h)``; keep it when that interval overlaps ``[start, end)``
    (``cli/src/file_reader.rs:76-106``). Non-matching filenames are skipped.
    Sort is lexicographic on the basename == chronological (O-s1).
    """
    if start is not None and start.tzinfo is None:
        start = start.replace(tzinfo=timezone.utc)
    if end is not None and end.tzinfo is None:
        end = end.replace(tzinfo=timezone.utc)
    kept: list[tuple[str, str]] = []
    for p in paths:
        name = posixpath.basename(p.replace("\\", "/"))
        m = _FILENAME_RE.match(name)
        if not m:
            continue
        file_time = parse_hour_bucket(m.group(1))
        if start is not None and file_time + HOUR <= start:
            continue
        if end is not None and file_time >= end:
            continue
        kept.append((name, p))
    kept.sort()
    return [p for _, p in kept]
