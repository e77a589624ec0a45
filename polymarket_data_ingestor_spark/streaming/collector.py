"""Streaming ingestion collector (SURVEY §2.1 S3/S6, §2.9 T1/T5/T6/T7).

The reference keeps WebSocket ingestion *outside* the analytics engine (a
Rust process writing framed JSONL; ``collector/src/main.rs``) and so do we:
this module is a plain-Python collector whose output files are exactly what
:mod:`..sources.frames` replays.

Three parts:

* :func:`take_chunk` / :func:`split_markets` — market→connection sharding
  (≤25 assets per connection, one oversized market allowed alone; mirrors
  ``collector/src/client/mod.rs:371-408`` including its unit-tested edge
  cases).
* :class:`FrameWriter` — the framed JSONL sink with hourly rotation, an
  ``active_markets`` snapshot as the first frame of every file, periodic
  flush, and a shutdown frame (mirrors ``collector/src/main.rs:72-298``).
  Plain file I/O — fully testable offline.
* :func:`collect` — the live collection loop, written against an
  *injectable transport* (:class:`Transport`) so the full pump —
  connect per chunk, subscribe, initial-read timeout, 15 s pings,
  frame forwarding, reconnect/split policy — runs offline under test
  with a fake transport; in production :class:`WebsocketsTransport`
  plugs in the real socket (``collector/src/client/connection.rs``).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import time
import zlib
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Callable, Sequence

from polymarket_data_ingestor_spark import manifest as _manifest

#: Max assets per WebSocket connection (``collector/src/client/mod.rs:9``).
MAX_ASSETS_PER_CONNECTION = 25
#: Flush cadence in messages (``collector/src/main.rs:199-202``).
FLUSH_EVERY = 100
#: App-level ping interval seconds (``collector/src/client/mod.rs:13-15``).
PING_INTERVAL_S = 15
WS_URL = "wss://ws-subscriptions-clob.polymarket.com/ws/market"


def _n_assets(market: dict) -> int:
    return len(market.get("tokens") or [])


def take_chunk(markets: list[dict]) -> tuple[list[dict], list[dict]]:
    """Greedy prefix with ≤25 total assets; an oversized market goes alone.

    Mirrors ``take_chunk`` (``collector/src/client/mod.rs:371-389``): take
    markets while the running asset count stays ≤25; if the *first* market
    alone exceeds 25, it still forms its own chunk.
    """
    if not markets:
        return [], []
    chunk: list[dict] = []
    total = 0
    for i, m in enumerate(markets):
        n = _n_assets(m)
        if chunk and total + n > MAX_ASSETS_PER_CONNECTION:
            return chunk, markets[i:]
        chunk.append(m)
        total += n
        if total >= MAX_ASSETS_PER_CONNECTION:
            return chunk, markets[i + 1:]
    return chunk, []


def split_markets(markets: Sequence[dict]) -> list[list[dict]]:
    """Partition markets into connection-sized chunks (T5,
    ``collector/src/client/mod.rs:402-408``)."""
    remaining = list(markets)
    out: list[list[dict]] = []
    while remaining:
        chunk, remaining = take_chunk(remaining)
        out.append(chunk)
    return out


def subscribe_message(markets: Sequence[dict]) -> str:
    """The wire subscribe frame (``connection.rs:230-248``); empty token
    ids are skipped as in the reference's ``filter(|id| !id.is_empty())``."""
    asset_ids = [
        t["token_id"] for m in markets for t in (m.get("tokens") or [])
        if t.get("token_id")
    ]
    return json.dumps({"type": "MARKET", "assets_ids": asset_ids})


class FrameWriter:
    """Framed JSONL sink with hourly rotation (S6 semantics).

    * every raw message is wrapped ``{timestamp, message_type, content}``
      with an RFC3339 now-timestamp (``main.rs:17-28``);
    * files rotate on the hour boundary, detected lazily on the next write
      (``main.rs:137-183``); the active file is ``current/log.jsonl[.gz]``,
      renamed to ``YYYY-MM-DD-HH.jsonl[.gz]`` at rotation;
    * after every rotation (and at startup) the market snapshot is re-logged
      as the file's first frame (``main.rs:176-179,346-347``);
    * flush every ``FLUSH_EVERY`` messages (T7);
    * every rotation also emits a ``<file>.manifest.json`` sidecar with
      the per-asset book-line counts accumulated while writing — the
      ingest-time form of the replay skew gate's statistic, so a warm
      lake's gate is a sidecar read instead of a raw-text scan of the
      whole file set (see ``polymarket_data_ingestor_spark.manifest``).

    gzip stands in for the reference's zstd (no Python zstd writer in this
    environment; the format contract is 'a compression codec Spark reads
    natively', which both satisfy).
    """

    def __init__(
        self,
        out_dir: str | Path,
        markets: list[dict] | None = None,
        compress: bool = False,
        now: Callable[[], datetime] | None = None,
    ) -> None:
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        (self.out_dir / "current").mkdir(exist_ok=True)
        self.compress = compress
        self._recover_torn_concat()
        self.markets = markets or []
        self._now = now or (lambda: datetime.now(timezone.utc))
        self._fh: io.TextIOBase | None = None
        self._msg_count = 0
        self._current_hour: datetime | None = None
        self._book_counts: dict[str, int] = {}
        self._manifest_ok = True

    # -- internals ---------------------------------------------------------

    def _ext(self) -> str:
        return ".jsonl.gz" if self.compress else ".jsonl"

    def _current_path(self) -> Path:
        return self.out_dir / "current" / f"log{self._ext()}"

    def _recover_torn_concat(self) -> None:
        """Undo a half-finished same-hour rotation concat (r13 advisor).

        :meth:`_rotate`'s concat path records the pre-append size of the
        hour file in a ``<file>.merging`` marker before appending the
        ``current/`` segment, and removes the marker only after the
        segment is unlinked. A crash anywhere inside that protocol is
        detectable here:

        * marker present AND ``current/`` still exists — the append died
          before the unlink (possibly mid-copy): truncate the hour file
          back to the recorded offset, restoring its pre-concat bytes
          (its existing sidecar, if any, is valid for them again); the
          intact ``current/`` segment re-merges at the next rotation.
          Without the undo, the restart would re-count AND re-concat
          those lines — duplicated frames with a sidecar whose counts
          match the duplicated content, invisible to the manifest gate.
        * marker present, ``current/`` gone — the append completed and
          only the marker removal was lost: nothing to undo.
        """
        cur = self._current_path()
        for marker in self.out_dir.glob(f"*{self._ext()}.merging"):
            target = marker.with_name(marker.name[: -len(".merging")])
            if cur.exists() and target.exists():
                try:
                    offset = int(marker.read_text())
                    if offset > target.stat().st_size:
                        raise ValueError("offset beyond file")
                except (OSError, ValueError):
                    # unreadable marker or impossible offset (the
                    # protocol can't produce either — atomic rename of
                    # a fully-written int; appends only grow): the
                    # undo point is unknown, so do NOT guess with a
                    # truncate (an over-large offset would zero-extend
                    # the file). Quarantine the marker, drop the
                    # sidecar so the gate scans the possibly-partial
                    # file honestly, and keep collecting rather than
                    # crash-looping the collector on a corrupt byte.
                    _manifest.manifest_path(target).unlink(
                        missing_ok=True
                    )
                    marker.rename(
                        marker.with_name(marker.name + ".corrupt")
                    )
                    continue
                # the pre-concat sidecar (written before the crash) is
                # valid for the truncated bytes again, but its recorded
                # mtime_ns won't survive the truncate — re-stamp it so
                # the gate keeps its fast path; any other sidecar state
                # is dropped (no sidecar -> the gate scans, the honest
                # fallback). _rotate writes the merged sidecar only
                # AFTER removing the marker, so a marker implies the
                # sidecar on disk, if any, predates the concat.
                counts = None
                try:
                    doc = json.loads(
                        _manifest.manifest_path(target).read_text()
                    )
                    if (
                        doc.get("version") == _manifest.MANIFEST_VERSION
                        and doc.get("file_size") == offset
                    ):
                        counts = doc["book_counts"]
                except (OSError, ValueError, KeyError):
                    pass
                os.truncate(target, offset)
                if counts is not None:
                    _manifest.write_manifest(target, counts)
                else:
                    _manifest.manifest_path(target).unlink(
                        missing_ok=True
                    )
            marker.unlink()
        # an interrupted atomic marker write leaves only a .tmp — no
        # append can have started (the marker rename precedes the copy)
        for tmp in self.out_dir.glob(f"*{self._ext()}.merging.tmp"):
            tmp.unlink()

    def _open(self) -> None:
        p = self._current_path()
        # Crash recovery: an unclean shutdown leaves a non-empty
        # current/ file we are about to APPEND to. Its existing lines
        # were never counted into _book_counts, so count them now —
        # otherwise the rotation manifest would record only the
        # post-restart lines while its file_size check matches the full
        # file, making the under-count permanently undetectable (the
        # gate would trust a wrong sidecar forever). If the leftover
        # can't be read back (e.g. a truncated gzip member), suppress
        # the manifest for THIS file instead: no sidecar → the gate
        # falls back to the raw scan, which is the honest answer.
        needs_newline = False
        try:
            if p.exists() and p.stat().st_size > 0:
                opener = gzip.open if self.compress else open
                last_line = None
                with opener(p, "rt", encoding="utf-8") as fh:
                    for line in fh:
                        last_line = line
                        _manifest.count_book_assets(
                            line.rstrip("\n"), self._book_counts
                        )
                # a crash mid-write can leave a TORN final line with no
                # newline: appending straight after it would glue the
                # next frame onto the fragment into one malformed line
                # that PERMISSIVE parsing silently drops BOTH halves of
                # (review finding) — terminate it first
                needs_newline = (
                    last_line is not None and not last_line.endswith("\n")
                )
        except (OSError, EOFError, UnicodeDecodeError, zlib.error):
            # BadGzipFile is OSError; a truncated gzip tail raises
            # EOFError mid-iteration; a bit-flipped deflate stream
            # raises zlib.error (none of these subclass each other)
            self._manifest_ok = False
            self._book_counts = {}
            if self.compress:
                # NEVER append a fresh gzip member after a truncated
                # one: every reader (python gzip, the Hadoop codec)
                # stops at the corrupt member, so all post-restart
                # frames would be unreadable (review finding). Move the
                # remnant aside for manual salvage and start clean.
                n = 0
                while True:
                    aside = p.with_name(f"{p.name}.torn-{n}")
                    if not aside.exists():
                        break
                    n += 1
                p.rename(aside)
        if self.compress:
            self._fh = gzip.open(p, "at", encoding="utf-8")
        else:
            self._fh = open(p, "a", encoding="utf-8")
        if needs_newline:
            self._fh.write("\n")

    def _hour(self, dt: datetime) -> datetime:
        return dt.replace(minute=0, second=0, microsecond=0)

    def _write_frame(self, message_type: str, content: str) -> None:
        assert self._fh is not None
        frame = {
            "timestamp": self._now().isoformat(),
            "message_type": message_type,
            "content": content,
        }
        line = json.dumps(frame)
        # gate statistic, accumulated on the SERIALIZED line so the
        # sidecar agrees byte-for-byte with a raw-text scan of the file
        _manifest.count_book_assets(line, self._book_counts)
        self._fh.write(line + "\n")
        self._msg_count += 1
        if self._msg_count % FLUSH_EVERY == 0:
            self._fh.flush()

    def _start_file(self) -> None:
        self._open()
        self._write_frame(
            "active_markets",
            json.dumps({"markets": self.markets, "count": len(self.markets)}),
        )

    def _rotate(self) -> Path:
        assert self._current_hour is not None and self._fh is not None
        self._fh.close()
        name = self._current_hour.strftime("%Y-%m-%d-%H") + self._ext()
        target = self.out_dir / name
        cur = self._current_path()
        if target.exists():
            # A same-hour restart already rotated a segment for this
            # hour: a plain rename would silently REPLACE it, losing
            # the earlier segment forever with a matching sidecar to
            # hide it (review finding). Concatenate instead — valid
            # for both layouts (JSONL lines; gzip members are
            # concatenable) — and merge the prior sidecar's counts so
            # the gate statistic still covers the whole file.
            import shutil

            prior = _manifest.read_manifest_counts(target)
            # Crash-idempotent concat protocol (r13 advisor — a crash
            # after the copy but before the unlink would otherwise make
            # the restart re-count and re-concatenate these lines:
            # duplicated frames hidden by a counts-matching sidecar).
            # Record the pre-append size in an atomically-written
            # marker BEFORE touching the file; _recover_torn_concat
            # truncates back to it if we die before unlinking cur.
            marker = target.with_name(target.name + ".merging")
            tmp = marker.with_name(marker.name + ".tmp")
            tmp.write_text(str(target.stat().st_size))
            tmp.rename(marker)
            with open(cur, "rb") as src, open(target, "ab") as dst:
                shutil.copyfileobj(src, dst)
                dst.flush()
                os.fsync(dst.fileno())
            cur.unlink()
            marker.unlink()
            if prior is not None and self._manifest_ok:
                for a, c in prior.items():
                    self._book_counts[a] = (
                        self._book_counts.get(a, 0) + c
                    )
            else:
                self._manifest_ok = False
        else:
            cur.rename(target)
        # the file is immutable from here: persist its gate statistic
        # (unless crash recovery could not reconstruct the leftover
        # lines' counts — then no sidecar, and the gate scans)
        if self._manifest_ok:
            _manifest.write_manifest(target, self._book_counts)
        else:
            # drop any now-stale sidecar from the replaced segment so
            # nothing ever reads counts that no longer match the file
            _manifest.manifest_path(target).unlink(missing_ok=True)
        self._book_counts = {}
        self._manifest_ok = True
        return target

    # -- public API --------------------------------------------------------

    def handle_message(self, raw: str) -> None:
        """Append one raw feed message, rotating on hour change."""
        now_hour = self._hour(self._now())
        if self._current_hour is None:
            self._current_hour = now_hour
            self._start_file()
        elif now_hour > self._current_hour:
            self._rotate()
            self._current_hour = now_hour
            self._start_file()
        self._write_frame("feed_message", raw)

    def set_markets(self, markets: list[dict]) -> None:
        self.markets = markets

    def log_event(self, message_type: str, content: dict) -> None:
        """Write an auxiliary event frame (e.g. ``all_connections_ready``,
        ``main.rs:55-64,243-256``) — dropped when no file is open yet,
        matching the reference's ``if let Some(ref mut writer)`` guard."""
        if self._fh is None:
            return
        self._write_frame(message_type, json.dumps(content))
        self._fh.flush()

    def shutdown(self, signal: str = "SIGINT") -> Path | None:
        """Log the shutdown frame (with the triggering signal,
        ``main.rs:45-53``), flush, and rotate the final file
        (``main.rs:292-298,352-407``)."""
        if self._fh is None:
            return None
        self._write_frame("shutdown_initiated", json.dumps({"signal": signal}))
        self._fh.flush()
        return self._rotate()


#: Liveness / reconnect policy constants (``collector/src/client``).
LONG_LIVED_S = 30  # connection.rs:165 — resets the failure counter
SPLIT_FAILURE_THRESHOLD = 20  # connection.rs:195
MAX_PARALLEL_OPENS = 50  # mod.rs:17
NORMAL_BACKOFF_S = 0.5  # reconnecter.rs:182-196
INITIAL_READ_TIMEOUT_S = 10  # mod.rs:13


class ConnectionState:
    """Per-connection liveness bookkeeping (``connection.rs:139-208``).

    Tracks consecutive failures and whether the connection ever lived long
    enough to count as working; decides when a problematic multi-market
    connection should be split to isolate a hot/broken market (T4).
    """

    def __init__(self, markets: list[dict]) -> None:
        self.markets = markets
        self.consecutive_failures = 0
        self.ever_long_lived = False
        self.opened_at: float | None = None
        # Has this connection EVER opened (for all_connections_ready) —
        # a per-state flag like the reference's, never keyed on id():
        # CPython reuses ids of collected states after a split, which
        # could spuriously satisfy the readiness check.
        self.has_ever_opened = False

    def record_open(self, now: float) -> None:
        self.opened_at = now

    def record_close(self, now: float) -> None:
        """A close after a long-lived run resets the failure counter
        (``connection.rs:149-179``); a short-lived run counts as a
        failure."""
        lived = (now - self.opened_at) if self.opened_at is not None else 0.0
        if self.opened_at is not None and lived >= LONG_LIVED_S:
            self.ever_long_lived = True
            self.consecutive_failures = 0
        else:
            self.consecutive_failures += 1
        self.opened_at = None

    def should_split(self) -> bool:
        """Truth table of ``connection.rs:187-208``: enough consecutive
        failures AND previously working AND more than one market."""
        return (
            self.consecutive_failures >= SPLIT_FAILURE_THRESHOLD
            and self.ever_long_lived
            and len(self.markets) > 1
        )

    def split(self) -> tuple["ConnectionState", "ConnectionState"]:
        """Split markets into two fresh connections
        (``reconnecter.rs:280-350``) — recursively isolates a problematic
        market."""
        mid = len(self.markets) // 2
        return (
            ConnectionState(self.markets[:mid]),
            ConnectionState(self.markets[mid:]),
        )


#: Liveness cap on the escalated backoff — a deliberate deviation from
#: the reference, whose reconnecter sleeps in its own tokio task while
#: ping tasks keep running (``connection.rs:288-360``): this port is
#: single-threaded, so an unbounded ``error_count``-second sleep would
#: starve the 15 s app-level pings of every HEALTHY connection and the
#: server would drop them for inactivity (review finding).
ESCALATED_BACKOFF_CAP_S = 10.0


def _batch_escalates(batch_size: int, failed_in_batch: int) -> bool:
    """The ONE copy of the majority rule (``reconnecter.rs:87-90``):
    ``n_errors >= n/2`` with INTEGER division — exactly-half batches
    (2 of 4) and 2-of-5 escalate; zero failures never do. (The old
    public form tested a strict majority, ``failed*2 > batch``,
    silently diverging from :func:`collect`'s inline rule AND the
    reference — review finding.)"""
    return (
        batch_size > 0
        and failed_in_batch >= max(batch_size // 2, 1)
    )


def reconnect_backoff(error_count: int) -> float:
    """Backoff policy (``reconnecter.rs:182-194``): 500 ms while
    ``error_count == 0``; ``max(error_count, 3)`` seconds — capped at
    :data:`ESCALATED_BACKOFF_CAP_S` for single-threaded ping liveness —
    whenever ``error_count > 0``. The gate is the COUNTER, not the last
    batch's outcome: a partially-failed batch (``n_errors < n/2``)
    leaves ``error_count`` unchanged (``reconnecter.rs:87-91``), so the
    escalated sleep PERSISTS across such batches until a zero-failure
    batch resets it (r13 advisor — the previous form re-derived the
    escalation from the last batch alone and silently dropped back to
    500 ms after any sub-majority failure). :func:`_batch_escalates`
    governs only the increments. This IS the function :func:`collect`
    sleeps on (no inline twin to drift)."""
    if error_count > 0:
        return min(float(max(error_count, 3)), ESCALATED_BACKOFF_CAP_S)
    return NORMAL_BACKOFF_S


def next_reconnect_batch(pending: list[ConnectionState]) -> list[ConnectionState]:
    """Up to 50 connections reconnect in parallel (``mod.rs:17``),
    splitting any that qualify first (T4). A split landing AT the cap
    keeps both halves (one-over, like :func:`collect`'s inline
    assembly) — the old ``batch[:50]`` silently dropped the second
    half, losing its markets from the returned batch (review
    finding)."""
    batch: list[ConnectionState] = []
    for conn in pending:
        if len(batch) >= MAX_PARALLEL_OPENS:
            break
        if conn.should_split():
            a, b = conn.split()
            batch.extend([a, b])
        else:
            batch.append(conn)
    return batch


#: App-level ping payload (``connection.rs:334``).
PING_TEXT = '{"type":"ping"}'


class RecvTimeout(Exception):
    """No text frame arrived within the recv timeout."""


class TransportClosed(Exception):
    """The connection closed (server close, stream end, or socket error)."""


class Transport:
    """Injectable socket factory: ``connect(url) -> connection``.

    A connection must provide ``send(text)``, ``recv(timeout) -> str``
    (raising :class:`RecvTimeout` / :class:`TransportClosed`; non-text
    frames are the transport's job to skip, ``connection.rs:322-326``)
    and ``close()``. ``connect`` raises :class:`TransportClosed` on
    handshake failure. The same pattern as ``sources/rest.py``'s
    injectable ``FetchPage``.
    """

    def connect(self, url: str) -> Any:  # pragma: no cover - interface
        raise NotImplementedError


class WebsocketsTransport(Transport):
    """Production transport over ``websockets.sync`` (gated import —
    the package is absent in this sandbox, so this class is exercised
    only in deployments; the :func:`collect` loop itself is fully
    tested offline against a fake transport)."""

    def __init__(self) -> None:
        try:
            import websockets.sync.client  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "live collection needs the 'websockets' package (not "
                "installed in this environment); pass a custom transport "
                "or use FrameWriter/split_markets offline"
            ) from e
        self._client = websockets.sync.client

    def connect(self, url: str) -> Any:  # pragma: no cover - needs network
        try:
            return _WebsocketsConn(self._client.connect(url))
        except Exception as e:
            raise TransportClosed(str(e)) from e


class _WebsocketsConn:  # pragma: no cover - needs network
    def __init__(self, ws: Any) -> None:
        self._ws = ws

    def send(self, text: str) -> None:
        try:
            self._ws.send(text)
        except Exception as e:
            raise TransportClosed(str(e)) from e

    def recv(self, timeout: float) -> str:
        import websockets.exceptions

        try:
            while True:
                msg = self._ws.recv(timeout=timeout)
                if isinstance(msg, str):
                    return msg
                # binary frames: ignore, as the reference ignores
                # non-text messages (connection.rs:322-326)
        except TimeoutError as e:
            raise RecvTimeout() from e
        except websockets.exceptions.ConnectionClosed as e:
            raise TransportClosed(str(e)) from e

    def close(self) -> None:
        try:
            self._ws.close()
        except Exception:
            pass


class _LiveConn:
    """A connected socket plus its liveness state and next ping deadline."""

    __slots__ = ("state", "sock", "next_ping")

    def __init__(self, state: ConnectionState, sock: Any, next_ping: float):
        self.state = state
        self.sock = sock
        self.next_ping = next_ping


def _open_connection(
    transport: Transport,
    state: ConnectionState,
    writer: FrameWriter,
    clock: Callable[[], float],
) -> _LiveConn | None:
    """Connect → subscribe → await first text frame within 10 s
    (``connection.rs:250-286``). Success forwards the first message and
    records the open; any failure records a close (failure counting per
    :meth:`ConnectionState.record_close`) and returns ``None``."""
    try:
        sock = transport.connect(WS_URL)
    except TransportClosed:
        state.record_close(clock())
        return None
    try:
        sock.send(subscribe_message(state.markets))
        first = sock.recv(timeout=INITIAL_READ_TIMEOUT_S)
    except (RecvTimeout, TransportClosed):
        sock.close()
        state.record_close(clock())
        return None
    state.record_open(clock())
    writer.handle_message(first)
    return _LiveConn(state, sock, clock() + PING_INTERVAL_S)


#: Max messages drained from one connection before servicing the others.
_DRAIN_LIMIT = 256


def collect(
    out_dir: str | Path,
    fetch_markets: Callable[[], list[dict]],
    transport: Transport | None = None,
    compress: bool = False,
    stop: Callable[[], bool] | None = None,
    clock: Callable[[], float] | None = None,
    sleep: Callable[[float], None] | None = None,
    now: Callable[[], datetime] | None = None,
    poll_timeout: float = 0.05,
) -> Path | None:
    """Live collection loop (S3/T2/T3/T4, ``collector/src/main.rs:300-407``
    + ``client/connection.rs:288-360`` + ``reconnecter.rs:68-109``).

    One connection per :func:`split_markets` chunk; each open sends the
    subscribe frame, must see a first text frame within 10 s, then pings
    every 15 s and forwards every text frame to
    :meth:`FrameWriter.handle_message`. Closes/failures feed the
    :class:`ConnectionState` policy: reconnect batches of ≤50 with the
    reference's backoff (500 ms normally, ``max(error_count, 3)`` s after a
    majority-failed batch), splitting connections that qualify (T4). When
    every connection has opened at least once, an ``all_connections_ready``
    frame is logged (``main.rs:258-267``).

    ``transport``/``clock``/``sleep``/``now``/``stop`` are injectable so the
    whole loop runs deterministically offline; by default it uses
    :class:`WebsocketsTransport` and wall clocks. Returns the final rotated
    file path (from :meth:`FrameWriter.shutdown`).
    """
    if transport is None:
        transport = WebsocketsTransport()  # pragma: no cover - needs package
    clock = clock or time.monotonic
    sleep = sleep or time.sleep
    stop = stop or (lambda: False)

    markets = fetch_markets()
    writer = FrameWriter(out_dir, markets, compress=compress, now=now)
    states = [ConnectionState(chunk) for chunk in split_markets(markets)]
    pending: list[ConnectionState] = list(states)
    live: list[_LiveConn] = []
    ready_logged = False
    error_count = 0

    def _mark_opened(state: ConnectionState) -> None:
        nonlocal ready_logged
        state.has_ever_opened = True
        if not ready_logged and all(s.has_ever_opened for s in states):
            ready_logged = True
            writer.log_event(
                "all_connections_ready",
                {"connection_count": len(states),
                 "markets_count": len(markets)},
            )

    def _drop(lc: _LiveConn) -> None:
        lc.sock.close()
        lc.state.record_close(clock())
        live.remove(lc)
        pending.append(lc.state)

    def _service_pings() -> None:
        # the ONE ping pass: called from the drain loop AND between the
        # reconnect path's sleeps/sequential opens, so a slow batch of
        # failing opens can no longer starve healthy connections past
        # the 15 s ping deadline (review finding)
        for lc in list(live):
            if clock() >= lc.next_ping:
                try:
                    lc.sock.send(PING_TEXT)
                    lc.next_ping = clock() + PING_INTERVAL_S
                except TransportClosed:
                    _drop(lc)

    try:
        while not stop():
            if not pending and not live:
                # Nothing to open and nothing to service (e.g.
                # fetch_markets() returned no markets): idle politely
                # instead of busy-spinning on stop().
                sleep(NORMAL_BACKOFF_S)
                continue
            if pending:
                # Backoff before each reconnect batch — the ONE policy
                # function (reconnect_backoff), keyed on the persistent
                # error_count like the reference, liveness-capped;
                # pings serviced on both sides of the sleep
                _service_pings()
                sleep(reconnect_backoff(error_count))
                _service_pings()
                # Assemble a batch of ≤50, splitting qualifying connections
                # first (reconnecter.rs:199-230)
                batch: list[ConnectionState] = []
                while pending and len(batch) < MAX_PARALLEL_OPENS:
                    st = pending.pop(0)
                    if st.should_split():
                        a, b = st.split()
                        states.remove(st)
                        states.extend([a, b])
                        batch.extend([a, b])
                    else:
                        batch.append(st)
                failed = 0
                for st in batch:
                    if stop():
                        pending.append(st)
                        continue
                    lc = _open_connection(transport, st, writer, clock)
                    if lc is None:
                        failed += 1
                        pending.append(st)
                    else:
                        live.append(lc)
                        _mark_opened(st)
                    # each sequential open can block up to the 10 s
                    # initial-read timeout — keep healthy connections
                    # pinged between opens
                    _service_pings()
                # Half-or-more-failed batches escalate the backoff
                # (_batch_escalates — the shared integer-division rule)
                if failed == 0:
                    error_count = 0
                elif _batch_escalates(len(batch), failed):
                    error_count += 1

            # Service every live connection: pings when due (the shared
            # pass), then drain available text frames into the writer.
            _service_pings()
            for lc in list(live):
                for _ in range(_DRAIN_LIMIT):
                    try:
                        msg = lc.sock.recv(timeout=poll_timeout)
                    except RecvTimeout:
                        break
                    except TransportClosed:
                        _drop(lc)
                        break
                    writer.handle_message(msg)
                    if clock() >= lc.next_ping or stop():
                        break
    finally:
        for lc in live:
            lc.sock.close()
    return writer.shutdown(signal="stop")
