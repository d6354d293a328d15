"""Post-execution metrics: the "measure, don't guess" helper.

``execution_metrics(df)`` runs a DataFrame and returns the per-operator SQL
metrics Spark actually recorded — output rows, shuffle bytes, spill — by
reading the session's SQLAppStatusStore (the programmatic form of the Spark
UI SQL tab). Plan-shape tests pin what the optimizer CHOSE; these metrics
pin what execution COST, so properties like "this shuffle is bounded by
vocabulary, not token count" are assertable instead of asserted-in-prose.

Works under AQE (the UI store aggregates accumulators from the stages that
really ran, where the driver's plan-copy metric objects stay zero). Metrics
are read for the LATEST execution in the store, so call it from the thread
that ran the action and without concurrent queries in the same session.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SIZE = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30, "TiB": 1 << 40}


def _parse_value(s: str) -> int | None:
    """'1,000' → 1000; '233.0 B' / '1.5 MiB' → bytes; timing/percentile
    displays and empty strings → None (kept raw)."""
    lines = s.strip().splitlines()
    if not lines:
        return None
    s = lines[0]
    m = re.fullmatch(r"([\d,]+(?:\.\d+)?)\s*(B|KiB|MiB|GiB|TiB)?", s)
    if not m:
        return None
    num = float(m.group(1).replace(",", ""))
    return int(num * _SIZE.get(m.group(2) or "B", 1)) if m.group(2) else int(num)


def execution_metrics(df: DataFrame, run: bool = True) -> list[dict]:
    """Execute ``df`` (a full count — every operator runs) and return
    ``[{"operator", "node_id", "metric", "raw", "value"}, ...]`` for the
    latest SQL execution; ``value`` is parsed (rows/bytes) or None."""
    spark = df.sparkSession
    if run:
        df.count()
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    if execs.isEmpty():
        return []
    exec_id = execs.apply(execs.size() - 1).executionId()
    names: dict[int, tuple[str, int, str]] = {}
    graph = store.planGraph(exec_id)
    nodes = graph.allNodes()
    for i in range(nodes.size()):
        node = nodes.apply(i)
        try:
            ms = node.metrics()
        except Exception:
            continue
        for j in range(ms.size()):
            sm = ms.apply(j)
            names[sm.accumulatorId()] = (node.name().strip(), node.id(), sm.name())
    out: list[dict] = []
    it = store.executionMetrics(exec_id).iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() not in names:
            continue
        op, node_id, metric = names[kv._1()]
        raw = kv._2()
        out.append(
            {
                "operator": op,
                "node_id": int(node_id),
                "metric": metric,
                "raw": raw,
                "value": _parse_value(raw),
            }
        )
    out.sort(key=lambda r: (r["node_id"], r["metric"]))
    return out


def shuffle_summary(df: DataFrame, run: bool = True) -> dict[str, int]:
    """Totals that predict 100 TB behavior: rows scanned, rows out of the
    final operator, bytes written by all exchanges, and spill."""
    rows = execution_metrics(df, run=run)

    def total(op_prefix: str | None, metric: str) -> int:
        return sum(
            r["value"] or 0
            for r in rows
            if r["metric"] == metric
            and (op_prefix is None or r["operator"].startswith(op_prefix))
        )

    scan_rows = total("Scan", "number of output rows")
    return {
        "scan_rows": scan_rows,
        "shuffle_bytes_written": total("Exchange", "shuffle bytes written"),
        "spill_bytes": total(None, "spill size"),
    }


class StreamingMetricsListener:
    """Per-micro-batch streaming telemetry: input rows, processing rate, and
    stateful-operator state size, captured from QueryProgressEvents — the
    programmatic form of the Streaming UI, and the numbers a production
    stream alerts on (state growth ⇒ watermark misconfigured; falling rate
    ⇒ falling behind the source).

    Usage::

        listener = StreamingMetricsListener.attach(spark)
        ... run stream to completion ...
        listener.detach()
        listener.summary(query_name)

    The underlying hook is ``spark.streams.addListener`` — driver-side,
    zero cost on executors; progress objects are built by the engine either
    way. Capture is append-only per (query name, batch id) so restarted or
    multi-batch availableNow runs accumulate a full history.
    """

    def __init__(self, spark) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        self.progress: list[dict] = []
        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:  # noqa: N802
                pass

            def onQueryProgress(self, event) -> None:  # noqa: N802
                p = event.progress
                state = p.stateOperators or []
                outer.progress.append(
                    {
                        "name": p.name,
                        "batch_id": p.batchId,
                        "input_rows": p.numInputRows,
                        "rows_per_sec": p.processedRowsPerSecond,
                        "state_rows": sum(s.numRowsTotal for s in state),
                        "late_rows_dropped": sum(
                            s.numRowsDroppedByWatermark for s in state
                        ),
                        "state_bytes": sum(s.memoryUsedBytes for s in state),
                        "watermark": p.eventTime.get("watermark"),
                        "observed": dict(p.observedMetrics or {}),
                    }
                )

            def onQueryIdle(self, event) -> None:  # noqa: N802
                pass

            def onQueryTerminated(self, event) -> None:  # noqa: N802
                pass

        self._listener = _L()
        self._spark = spark

    @classmethod
    def attach(cls, spark) -> "StreamingMetricsListener":
        inst = cls(spark)
        spark.streams.addListener(inst._listener)
        return inst

    def detach(self) -> None:
        self._spark.streams.removeListener(self._listener)

    def summary(self, name: str | None = None) -> dict:
        """Totals over captured batches (optionally for one query name)."""
        rows = [
            r
            for r in self.progress
            if name is None or r["name"] == name
        ]
        return {
            "n_batches": len(rows),
            "input_rows": sum(r["input_rows"] for r in rows),
            "max_state_rows": max((r["state_rows"] for r in rows), default=0),
            "late_rows_dropped": sum(r["late_rows_dropped"] for r in rows),
            "max_state_bytes": max((r["state_bytes"] for r in rows), default=0),
            "final_watermark": rows[-1]["watermark"] if rows else None,
            # Per-observation-name totals of every numeric metric (the
            # expectations counters ride here when the stream was built
            # with quality.annotate_observed).
            "observed_totals": self._observed_totals(rows),
        }

    @staticmethod
    def _observed_totals(rows: list[dict]) -> dict:
        totals: dict = {}
        for r in rows:
            for obs_name, row in (r.get("observed") or {}).items():
                slot = totals.setdefault(obs_name, {})
                for k, v in row.asDict().items():
                    if isinstance(v, (int, float)):
                        slot[k] = slot.get(k, 0) + v
        return totals
