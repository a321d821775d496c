"""Streaming-query lifecycle supervision: start / monitor / restart
(SURVEY H9's deploy half — the reference keeps its feed loop alive
with bounded reconnect retries + backoff and a staleness watchdog,
main.py:233-309; staleness *detection* itself is the event-time-timer
stream in streaming/pipeline.py:staleness_stream).

The supervisor owns one structured-streaming query. Recovery leans
entirely on the checkpoint: a restart calls the SAME factory with the
SAME checkpoint location, so committed epochs are never re-emitted and
stateful operators resume their store — state-intact restart is a
property of Spark's checkpoint contract, the supervisor just has to
not get creative (never wipe the checkpoint, never change the query
shape between attempts).

Scale notes: supervision is pure driver-side control flow (a poll loop
over ``awaitTermination(timeout)``); no data moves through it. The
staleness probe is pluggable so deployments can point it at the
``staleness_stream`` alert table, a lag metric, or query progress —
anything cheap enough to poll.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQuery


def progress_stale_probe(
    get_query: Callable[[], StreamingQuery | None], max_silence_sec: float
) -> Callable[[], bool]:
    """A staleness probe over query progress events: True when the
    running query has made NO progress update for ``max_silence_sec``
    (wall clock). Complements staleness_stream's per-key event-time
    alerts with a whole-query liveness check (a wedged source makes no
    progress at all, so no alert row would ever be emitted)."""
    last_change = [time.monotonic(), None]

    def probe() -> bool:
        q = get_query()
        if q is None:
            return False
        p = q.lastProgress
        stamp = p["timestamp"] if p else None
        if stamp != last_change[1]:
            last_change[0] = time.monotonic()
            last_change[1] = stamp
        return time.monotonic() - last_change[0] > max_silence_sec

    return probe


def alert_table_probe(spark, alert_dir: str) -> Callable[[], bool]:
    """A staleness probe over the ``staleness_stream`` alert SINK: True
    exactly when NEW alert rows landed since the last poll (the watch
    stream's event-time timers write a row per silent key — see
    streaming/pipeline.py:staleness_stream). This is the glue between
    the detection half (H9's alert table) and the deploy half (this
    supervisor): run the watchdog stream against the same source,
    point its sink here, and the supervisor restarts the wedged
    pipeline when alerts start arriving. Counting is one cheap
    metadata+count job per poll over a table that is empty in the
    healthy case — a bare ``limit(1)`` existence check would be
    strictly tighter but loses the new-since-last-poll delta this
    probe is defined by (an old, already-acted-on alert must not
    re-fire a restart), and parquet ``count()`` is satisfied from
    footer row counts, not a data scan. The row count at probe CREATION is the baseline:
    alert rows a previous supervisor incarnation already acted on
    must not fire a spurious restart on the first poll (restarts are
    a bounded budget)."""

    def _count() -> int | None:
        from pyspark.errors import AnalysisException

        try:
            # the watchdog stream appends while we poll — drop any
            # cached listing so the count sees the newest files
            spark.catalog.refreshByPath(alert_dir)
            return spark.read.parquet(alert_dir).count()
        except AnalysisException:  # sink not created yet — healthy
            return None
        # anything else (corrupt footer, permissions, schema clash)
        # propagates: a watchdog whose alert table became unreadable
        # must fail loudly, not report eternal health

    seen = [_count() or 0]

    def probe() -> bool:
        n = _count()
        if n is None:
            return False
        fired = n > seen[0]
        seen[0] = n
        return fired

    return probe


def supervise(
    start: Callable[[], StreamingQuery],
    max_restarts: int = 3,
    backoff_sec: float = 1.0,
    poll_sec: float = 0.25,
    stale_probe: Callable[[], bool] | None = None,
    on_event: Callable[[str], None] | None = None,
    until: Callable[[StreamingQuery], bool] | None = None,
) -> dict:
    """Run a streaming query under crash/staleness supervision until it
    terminates cleanly or the restart budget is spent.

    ``start`` is the query factory — it must start the SAME query
    against the SAME checkpoint every call (that is what makes a
    restart resume instead of replay). Failed attempts restart after
    exponential backoff (``backoff_sec * 2**k``, reference cadence:
    3 retries); a True from ``stale_probe`` stops the wedged query
    and restarts it, drawing from the same budget.

    ``until`` is the completion condition for CONTINUOUS-trigger
    queries (processingTime cadence — they never terminate on their
    own): polled each round with the live query, and when it returns
    True the query is stopped cleanly and the run reported completed.
    This is how a production-cadence run composes with the same
    supervisor as a drain-to-done run (H7 + H9 in one lifecycle).

    Returns a report dict:
    ``{"completed": bool, "restarts": int, "stale_restarts": int,
    "failures": [str, ...]}`` — ``completed`` is False only when the
    budget ran out, and the last failure message says why.
    """
    report = {
        "completed": False,
        "restarts": 0,
        "stale_restarts": 0,
        "failures": [],
    }

    def note(msg: str) -> None:
        if on_event is not None:
            on_event(msg)

    def used() -> int:
        return report["restarts"] + report["stale_restarts"]

    def try_start() -> StreamingQuery | None:
        """start() under the same budget/backoff as a crashed query: a
        factory that throws (locked checkpoint, transient FS error at
        launch) records the failure and retries instead of escaping
        with the accumulated report lost. None = budget spent."""
        while True:
            try:
                return start()
            except Exception as e:
                report["failures"].append(" ".join(str(e).split())[:2000])
                if used() >= max_restarts:
                    note("start failed; restart budget exhausted")
                    return None
                delay = backoff_sec * (2 ** used())
                note(f"start failed; retrying in {delay:.2f}s")
                time.sleep(delay)
                report["restarts"] += 1

    q = try_start()
    if q is None:
        return report
    note("started")
    while True:
        try:
            done = q.awaitTermination(poll_sec)
        except Exception as e:  # terminated with error
            done, q_exc = True, e
        else:
            q_exc = q.exception() if done else None
        if done:
            if q_exc is None:
                report["completed"] = True
                note("completed")
                return report
            report["failures"].append(" ".join(str(q_exc).split())[:2000])
            if used() >= max_restarts:
                note("restart budget exhausted")
                return report
            delay = backoff_sec * (2 ** used())
            note(f"crashed; restarting in {delay:.2f}s")
            time.sleep(delay)
            report["restarts"] += 1
            q = try_start()
            if q is None:
                return report
            continue
        if until is not None and until(q):
            note("until-condition met; stopping cleanly")
            q.stop()
            try:
                q.awaitTermination()
            except Exception as exc:  # noisy stop is expected — record
                note(f"stop-drain raised: {exc}")
            report["completed"] = True
            return report
        if stale_probe is not None and stale_probe():
            if used() >= max_restarts:
                report["failures"].append("stale and restart budget exhausted")
                note("stale; budget exhausted — stopping")
                q.stop()
                return report
            note("stale; stopping and restarting")
            q.stop()
            # drain the stop before relaunching on the same checkpoint
            try:
                q.awaitTermination()
            except Exception as exc:  # noisy stop of a wedged query is
                # expected — record it instead of swallowing silently
                note(f"stop-drain raised: {exc}")
            delay = backoff_sec * (2 ** used())
            time.sleep(delay)
            report["stale_restarts"] += 1
            q = try_start()
            if q is None:
                return report


def run_processing_time(
    df,
    out_dir: str,
    checkpoint: str,
    interval: str = "1 second",
    min_data_batches: int = 2,
    timeout_sec: float = 120.0,
    poll_sec: float = 0.1,
    max_restarts: int = 3,
    on_event: Callable[[str], None] | None = None,
) -> dict:
    """H7: the production trigger cadence, executable. The reference
    throttles its per-message callbacks so the strategy evaluates at
    most every 50 ms (main.py:128-132, config.py:37); the Spark-first
    mapping is ``trigger(processingTime=...)`` — micro-batches fire on
    interval ticks regardless of message arrival rate, which IS the
    throttle (per-message work is absorbed into the next tick's batch).

    Runs the sink under :func:`supervise` with an ``until`` condition,
    so cadence and lifecycle compose: crashes restart on the same
    checkpoint, and the run completes once ``min_data_batches``
    micro-batches that actually carried rows have committed (or
    ``timeout_sec`` elapses — reported, never hung).

    Returns ``{"report": supervise-report, "progress": [progress dicts
    by batchId], "timed_out": bool}``; the progress list carries each
    batch's trigger ``timestamp`` so callers can assert the cadence
    (tests/test_lifecycle.py does — ≥2 data batches on distinct
    interval ticks, same rows as an ``availableNow`` drain)."""
    seen: dict[int, dict] = {}
    deadline = time.monotonic() + timeout_sec
    timed_out = [False]

    def factory() -> StreamingQuery:
        return (
            df.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(processingTime=interval)
            .start()
        )

    def until(q: StreamingQuery) -> bool:
        # harvest progress BEFORE deciding: recentProgress is a
        # bounded ring buffer, so poll-time capture is the only way
        # to hand the full trajectory back to the caller
        for prog in q.recentProgress:
            if prog is not None:
                seen[prog["batchId"]] = prog
        n_data = sum(1 for p in seen.values() if p["numInputRows"] > 0)
        if n_data >= min_data_batches:
            return True
        if time.monotonic() > deadline:
            timed_out[0] = True
            return True
        return False

    report = supervise(
        factory,
        max_restarts=max_restarts,
        poll_sec=poll_sec,
        on_event=on_event,
        until=until,
    )
    return {
        "report": report,
        "progress": [seen[b] for b in sorted(seen)],
        "timed_out": timed_out[0],
    }
