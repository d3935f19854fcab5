"""Pipeline metrics / observability surface.

The reference documents a monitoring contract for its DSQL connector
(``docs/content/docs/connectors/pipeline-connectors/dsql.md:271-279``):

- Connection Pool Metrics: active connections, idle connections,
  acquisition time
- Authentication Metrics: token refresh count, authentication failures
- Full Load Metrics: records loaded, load progress, throughput
- CDC Metrics: events processed, processing latency, commit latency
- Error Metrics: error count by category, retry attempts

and categorizes errors for reporting in ``DsqlErrorReporter.java``
(``ErrorCategory`` enum :41-50, message-shape classifier
``categorizeError`` :248-303).

Spark-idiomatic shape (not a Flink metric-group translation):

- A **driver-side registry** (:class:`MetricsRegistry`) holds counters
  and latency timers; it is the ``metrics()`` face every writer /
  authenticator / composer feeds.
- **Executor-side increments** ride ONE Spark dict-accumulator per
  registry (:meth:`MetricsRegistry.executor_handle`): tasks add
  ``{key: delta}`` dicts, Spark merges them with the task result
  protocol (exactly how distributed counters should work — no side
  channel, no driver collect), and ``snapshot()`` folds the
  accumulator's cumulative value in. The picklable
  :class:`ExecutorMetrics` handle is what closures capture — the
  registry itself (which owns a lock) never crosses the wire.
- **Structured Streaming progress** feeds the same registry through
  :class:`MetricsStreamingListener` (``spark.streams.addListener``):
  per micro-batch input rows, processing rate, and trigger latency —
  the engine's own numbers, not re-measured.

Timers are additively mergeable (count/sum plus max/min folded with
max/min semantics in the accumulator), so percentile-free but
scale-safe: no per-event state, O(metrics) memory at any data size.
"""

from __future__ import annotations

import json
import threading
import time as _time
from contextlib import contextmanager

# ---------------------------------------------------------------------------
# error categories (DsqlErrorReporter.ErrorCategory parity)
# ---------------------------------------------------------------------------

ERROR_CATEGORIES = (
    "CONNECTION_ERROR",
    "AUTHENTICATION_ERROR",
    "SCHEMA_ERROR",
    "DATA_TYPE_ERROR",
    "FULL_LOAD_ERROR",
    "CDC_ERROR",
    "CONFIGURATION_ERROR",
    "UNKNOWN_ERROR",
)


def categorize_error(error: BaseException | None) -> str:
    """Message-shape error classifier — semantics of the reference's
    ``DsqlErrorReporter.categorizeError`` (:248-303): substring checks
    over the message and exception type name, most-specific first, with
    the SQLSTATE class checks mapped onto the DB-API equivalent (a
    ``sqlstate``/``pgcode`` attribute when the driver exposes one)."""
    if error is None:
        return "UNKNOWN_ERROR"
    msg = (str(error) or "").lower()
    typ = type(error).__name__.lower()
    if ("connection" in msg or "timeout" in msg or "network" in msg
            or "connection" in typ):
        return "CONNECTION_ERROR"
    if ("auth" in msg or "credential" in msg or "permission" in msg
            or "access denied" in msg):
        return "AUTHENTICATION_ERROR"
    if ("schema" in msg or "table" in msg or "column" in msg
            or "constraint" in msg):
        return "SCHEMA_ERROR"
    if ("type" in msg or "conversion" in msg or "cast" in msg
            or "format" in msg):
        return "DATA_TYPE_ERROR"
    sqlstate = getattr(error, "sqlstate", None) or \
        getattr(error, "pgcode", None)
    if isinstance(sqlstate, str):
        if sqlstate.startswith("08"):
            return "CONNECTION_ERROR"
        if sqlstate.startswith("22"):
            return "DATA_TYPE_ERROR"
        if sqlstate.startswith("42"):
            return "SCHEMA_ERROR"
    return "UNKNOWN_ERROR"


# ---------------------------------------------------------------------------
# metric names (the documented contract, one constant per line item)
# ---------------------------------------------------------------------------

EVENTS_PROCESSED = "cdc.events.processed"          # counter, per-table
PROCESSING_LATENCY = "cdc.processing.latency"      # timer, per-table
COMMIT_LATENCY = "cdc.commit.latency"              # timer, per-table
TOKEN_REFRESH_COUNT = "auth.token.refresh.count"   # counter
AUTH_FAILURES = "auth.failures"                    # counter
FULL_LOAD_RECORDS = "fullload.records"             # counter, per-table
FULL_LOAD_CHUNKS_TOTAL = "fullload.chunks.total"   # counter, per-table
FULL_LOAD_CHUNKS_DONE = "fullload.chunks.done"     # counter, per-table
POOL_ACTIVE = "pool.connections.active"            # gauge (set)
POOL_CREATED = "pool.connections.created"          # counter
POOL_RETIRED = "pool.connections.retired"          # counter
POOL_ACQUIRE_LATENCY = "pool.acquire.latency"      # timer
RETRY_ATTEMPTS = "errors.retry.attempts"           # counter
SCHEMA_CHANGES_APPLIED = "schema.changes.applied"  # counter, per-table
STREAM_INPUT_ROWS = "stream.input.rows"            # counter (listener)
STREAM_BATCHES = "stream.batches"                  # counter (listener)
STREAM_TRIGGER_LATENCY = "stream.trigger.latency"  # timer (listener)


def error_counter(category: str) -> str:
    return f"errors.{category}"


def _key(metric: str, table: str | None) -> str:
    return f"{metric}#{table}" if table else metric


# suffix conventions for additively-merged timer components
_CNT, _SUM, _MAX, _MIN = "|count", "|sum", "|max", "|min"


def _merge_entry(store: dict, key: str, value: float) -> None:
    """Merge one (key, delta) into a flat metrics dict under the suffix
    conventions: plain keys and ``|count``/``|sum`` add; ``|max`` keeps
    max; ``|min`` keeps min. THE single merge rule shared by the
    driver registry and the Spark accumulator, so executor and driver
    increments fold identically."""
    if key.endswith(_MAX):
        store[key] = max(store.get(key, float("-inf")), value)
    elif key.endswith(_MIN):
        store[key] = min(store.get(key, float("inf")), value)
    else:
        store[key] = store.get(key, 0) + value


class _DictAccumulatorParam:
    """Spark ``AccumulatorParam`` over flat metric dicts — executor
    tasks ``add({key: delta})``, Spark folds with :func:`_merge_entry`
    semantics on the task-result path."""

    def zero(self, value):  # noqa: D102 — AccumulatorParam protocol
        return {}

    def addInPlace(self, a, b):  # noqa: N802 — protocol name
        for k, v in b.items():
            _merge_entry(a, k, v)
        return a


class ExecutorMetrics:
    """Picklable executor-side handle: closures capture THIS, never the
    registry. Falls back to a plain local dict when built without a
    SparkContext (unit tests, driver-local paths)."""

    def __init__(self, acc=None):
        self._acc = acc
        # _local is ALWAYS a dict, even once an accumulator is
        # attached: the in-place upgrade (executor_handle) races with
        # an unlocked concurrent _add that already read _acc as None —
        # that thread's merge lands here, and snapshot reads fold BOTH
        # stores, so nothing is lost and nothing is ever None
        self._local: dict = {}

    def _add(self, delta: dict) -> None:
        acc = self._acc  # one read: upgrade may land mid-call
        if acc is not None:
            acc.add(delta)
        else:
            for k, v in delta.items():
                _merge_entry(self._local, k, v)

    def inc(self, metric: str, value: float = 1,
            table: str | None = None) -> None:
        self._add({_key(metric, table): value})

    def observe(self, metric: str, seconds: float,
                table: str | None = None) -> None:
        k = _key(metric, table)
        self._add({k + _CNT: 1, k + _SUM: seconds,
                   k + _MAX: seconds, k + _MIN: seconds})

    def record_error(self, error: BaseException, *,
                     retried: bool = False) -> str:
        category = categorize_error(error)
        delta = {error_counter(category): 1}
        if retried:
            delta[RETRY_ATTEMPTS] = 1
        self._add(delta)
        return category


class MetricsRegistry:
    """Driver-side metrics registry — the ``metrics()`` face.

    Thread-safe (foreachBatch threads + the listener bus feed it
    concurrently). NOT picklable by design: executor closures take
    :meth:`executor_handle`."""

    def __init__(self, name: str = "default"):
        self.name = name
        self._lock = threading.Lock()
        self._store: dict[str, float] = {}
        self._gauges: dict[str, float] = {}
        self._handle: ExecutorMetrics | None = None

    # -- writes -----------------------------------------------------------

    def inc(self, metric: str, value: float = 1,
            table: str | None = None) -> None:
        with self._lock:
            _merge_entry(self._store, _key(metric, table), value)

    def observe(self, metric: str, seconds: float,
                table: str | None = None) -> None:
        k = _key(metric, table)
        with self._lock:
            _merge_entry(self._store, k + _CNT, 1)
            _merge_entry(self._store, k + _SUM, seconds)
            _merge_entry(self._store, k + _MAX, seconds)
            _merge_entry(self._store, k + _MIN, seconds)

    def set_gauge(self, metric: str, value: float,
                  table: str | None = None) -> None:
        with self._lock:
            self._gauges[_key(metric, table)] = value

    @contextmanager
    def time(self, metric: str, table: str | None = None):
        t0 = _time.monotonic()
        try:
            yield
        finally:
            self.observe(metric, _time.monotonic() - t0, table)

    def record_error(self, error: BaseException, *,
                     retried: bool = False) -> str:
        """Count an error under its DsqlErrorReporter category (plus
        the retry-attempts counter when it was retried). Returns the
        category so callers can embed it in the raised message."""
        category = categorize_error(error)
        self.inc(error_counter(category))
        if retried:
            self.inc(RETRY_ATTEMPTS)
        return category

    # -- executor bridge ----------------------------------------------------

    def executor_handle(self, spark=None) -> ExecutorMetrics:
        """The picklable handle executor closures capture. With a
        SparkSession it is backed by one dict accumulator (created
        once, cached); without, by a driver-local dict that still
        surfaces in :meth:`snapshot` (tests / driver-only paths).

        Standard Spark accumulator caveat applies: updates are
        exactly-once per successful ACTION, but re-executing a lazy
        plan (a second action over the same un-cached DataFrame, or a
        recomputed evicted partition) re-counts. Instrumented readers
        should be driven once and their results reused."""
        with self._lock:
            if self._handle is None:
                acc = None
                if spark is not None:
                    acc = spark.sparkContext.accumulator(
                        {}, _DictAccumulatorParam())
                self._handle = ExecutorMetrics(acc)
            elif self._handle._acc is None and spark is not None:
                # Upgrade a driver-local handle in place the first time a
                # SparkSession is available: if the registry was first
                # touched by a driver-only caller (JdbcUpsertSink with
                # parallel=False passes spark=None) the cached handle is
                # dict-backed, and shipping THAT to executors would lose
                # every increment (per-process copies). Attaching the
                # accumulator to the same object means all driver-held
                # references upgrade too. The pre-upgrade local dict is
                # NOT copied into the accumulator — a concurrent _add
                # that read _acc as None can still be merging into it
                # (the registry is documented thread-safe), and a copy
                # would either drop that merge or double-count it;
                # instead _merged folds the local dict alongside the
                # accumulator forever, so late-racing increments land
                # and count exactly once.
                self._handle._acc = spark.sparkContext.accumulator(
                    {}, _DictAccumulatorParam())
            return self._handle

    # -- reads --------------------------------------------------------------

    def _merged(self) -> dict[str, float]:
        with self._lock:
            out = dict(self._store)
        if self._handle is not None:
            # fold BOTH stores: the accumulator (post-upgrade adds)
            # and the local dict (pre-upgrade adds + any _add that
            # raced the upgrade). Disjoint in time per thread, so no
            # increment is counted twice.
            for ext in (self._handle._acc.value
                        if self._handle._acc is not None else None,
                        self._handle._local):
                if ext:
                    for k, v in dict(ext).items():
                        _merge_entry(out, k, v)
        return out

    def get(self, metric: str, table: str | None = None) -> float:
        return self._merged().get(_key(metric, table), 0)

    def timer_stats(self, metric: str,
                    table: str | None = None) -> dict:
        m = self._merged()
        k = _key(metric, table)
        count = m.get(k + _CNT, 0)
        total = m.get(k + _SUM, 0.0)
        return {
            "count": int(count),
            "sum_s": total,
            "avg_s": (total / count) if count else 0.0,
            "max_s": m.get(k + _MAX, 0.0),
            "min_s": m.get(k + _MIN, 0.0) if count else 0.0,
        }

    def snapshot(self) -> dict:
        """The full report, shaped after the documented contract's five
        groups. Counters keyed ``metric`` or ``metric#table``."""
        m = self._merged()
        counters = {k: v for k, v in m.items()
                    if not any(k.endswith(s)
                               for s in (_CNT, _SUM, _MAX, _MIN))}
        timers = {}
        for k in {k[:-len(_CNT)] for k in m if k.endswith(_CNT)}:
            base, _, table = k.partition("#")
            timers[k] = self.timer_stats(base, table or None)
        with self._lock:
            gauges = dict(self._gauges)
        errors = {c: counters.get(error_counter(c), 0)
                  for c in ERROR_CATEGORIES
                  if counters.get(error_counter(c), 0)}
        return {
            "registry": self.name,
            "counters": {k: counters[k] for k in sorted(counters)},
            "timers": {k: timers[k] for k in sorted(timers)},
            "gauges": {k: gauges[k] for k in sorted(gauges)},
            "errors_by_category": errors,
        }

    def report(self) -> str:
        return json.dumps(self.snapshot(), indent=2, sort_keys=True)

    def reset(self) -> None:
        with self._lock:
            self._store.clear()
            self._gauges.clear()
            self._handle = None


# -- named registries (one per pipeline) --------------------------------------

_REGISTRIES: dict[str, MetricsRegistry] = {}
_REG_LOCK = threading.Lock()


def registry(name: str = "default") -> MetricsRegistry:
    with _REG_LOCK:
        reg = _REGISTRIES.get(name)
        if reg is None:
            reg = _REGISTRIES[name] = MetricsRegistry(name)
        return reg


# ---------------------------------------------------------------------------
# Structured Streaming progress → registry
# ---------------------------------------------------------------------------

def make_streaming_listener(reg: MetricsRegistry):
    """A ``StreamingQueryListener`` feeding engine-reported per-batch
    progress (input rows, trigger latency) into ``reg``. Attach with
    ``spark.streams.addListener(listener)``; detach with
    ``removeListener`` when the pipeline stops."""
    from pyspark.sql.streaming import StreamingQueryListener

    class MetricsStreamingListener(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802 — listener protocol
            reg.inc("stream.queries.started")

        def onQueryProgress(self, event):  # noqa: N802
            p = event.progress
            reg.inc(STREAM_BATCHES)
            reg.inc(STREAM_INPUT_ROWS, p.numInputRows or 0)
            trig = (p.durationMs or {}).get("triggerExecution")
            if trig is not None:
                reg.observe(STREAM_TRIGGER_LATENCY, trig / 1000.0)

        def onQueryTerminated(self, event):  # noqa: N802
            reg.inc("stream.queries.terminated")

        def onQueryIdle(self, event):  # noqa: N802
            pass

    return MetricsStreamingListener()
