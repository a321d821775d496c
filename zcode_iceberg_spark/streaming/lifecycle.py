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
) -> dict:
    """Run a streaming query under crash/staleness supervision until it
    terminates cleanly or the restart budget is spent.

    ``start`` is the query factory — it must start the SAME query
    against the SAME checkpoint every call (that is what makes a
    restart resume instead of replay). Failed attempts restart after
    exponential backoff (``backoff_sec * 2**k``, reference cadence:
    3 retries); a True from ``stale_probe`` stops the wedged query
    and restarts it, drawing from the same budget.

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
