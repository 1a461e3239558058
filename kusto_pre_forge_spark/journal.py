"""Performance-counter journal — run metrics, reference-parity surface.

≡ PerfCounterJournal (code/KustoPreForgeLib/PerfCounterJournal.cs:10-72):
named long readings accumulate in a queue; a background reporter drains it
every 5 s, sums by counter name, and prints ``Name:  1,234`` lines.

Spark-first: counters are NOT collected via per-row accumulators or Python
UDFs in the hot path — that would drag row processing into Python. Instead
the plans feed the journal from aggregates they already compute (shard
manifests, partition samples) and from Spark's own task metrics, so the
journal costs nothing extra at 100 TB. The queue/drain/report mechanics
mirror the reference so operational output looks the same.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from collections.abc import Callable


class PerfJournal:
    """Thread-safe named-counter journal with periodic reporting.

    ``add_reading`` may be called from any thread (e.g. a streaming
    foreachBatch callback); ``start_reporting`` launches the 5 s drain
    loop (PerfCounterJournal.DELAY). ``snapshot`` returns the running
    per-name sums without draining.
    """

    def __init__(
        self,
        delay_seconds: float = 5.0,
        sink: Callable[[str], None] = print,
    ) -> None:
        self._delay = delay_seconds
        self._sink = sink
        self._lock = threading.Lock()
        self._pending: list[tuple[str, int]] = []
        self._totals: dict[str, int] = defaultdict(int)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def add_reading(self, name: str, value: int) -> None:
        with self._lock:
            self._pending.append((name, int(value)))
            self._totals[name] += int(value)

    def snapshot(self) -> dict[str, int]:
        """Running sums per counter name (all readings ever added)."""
        with self._lock:
            return dict(self._totals)

    def report_counters(self) -> None:
        """Drain pending readings, print per-name sums since last report
        (the reference reports deltas per 5 s window, not lifetime sums)."""
        with self._lock:
            drained, self._pending = self._pending, []
        if not drained:
            return
        sums: dict[str, int] = defaultdict(int)
        for name, value in drained:
            sums[name] += value
        for name in sorted(sums):
            self._sink(f"{name}:  {sums[name]:,}")
        self._sink("")

    def start_reporting(self) -> None:
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(self._delay):
                self.report_counters()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop_reporting(self) -> None:
        """Stop the loop and flush one final report (StopReportingAsync)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self._delay + 1)
            self._thread = None
        self.report_counters()


def observe_into_journal(df, journal: PerfJournal, prefix: str, **aggs):
    """Attach Spark ``Observation`` metrics to a DataFrame and return
    ``(observed_df, flush)`` — the zero-cost way to journal row counts /
    null counts / byte sums at 100 TB: the aggregates piggyback on the
    plan's own execution (computed task-side during whatever action the
    caller runs), never a second scan, never a per-row accumulator.

    ``aggs`` maps counter names to aggregate Columns
    (``rows=F.count(F.lit(1)), bad=F.sum(F.when(...))``). After running
    ANY action on the returned DataFrame, call ``flush()`` once to push
    the observed values into the journal under ``{prefix}.{name}``.

    ≡ the reference's per-stage counters (PerfCounterJournal readings
    from DownloadBlobTransform/PartitioningTextTransform), re-expressed
    as engine-computed metrics instead of hand-maintained longs.
    """
    from pyspark.sql import Observation

    obs = Observation()
    named = [col.alias(name) for name, col in aggs.items()]
    observed = df.observe(obs, *named)

    def flush() -> dict[str, int]:
        got = obs.get  # blocks until the action has materialized metrics
        for name, value in got.items():
            if value is not None:
                journal.add_reading(f"{prefix}.{name}", int(value))
        return {k: int(v) for k, v in got.items() if v is not None}

    return observed, flush
