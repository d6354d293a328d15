"""Unit tests for the declarative expectations layer (lakeflow.quality)."""

from __future__ import annotations

import pytest

from lakeflow.quality import (
    Expectation,
    ExpectationFailedError,
    annotate,
    enforce,
    expectation_report,
    split,
)

RULES = [
    Expectation("v_positive", "v > 0", "drop"),
    Expectation("name_present", "name IS NOT NULL", "fail"),
    Expectation("v_small", "v < 100", "warn"),
]


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),     # clean
            (2, "b", -5.0),     # drops: v_positive
            (3, "c", 250.0),    # warn only: v_small — stays in good
            (4, "d", None),     # NULL predicate → violation (v_positive, v_small)
        ],
        "id int, name string, v double",
    )


def test_annotate_names_all_failed_rules_sorted(spark):
    rows = {r["id"]: r["violations"] for r in annotate(_frame(spark), RULES).collect()}
    assert rows[1] == []
    assert rows[2] == ["v_positive"]
    assert rows[3] == ["v_small"]
    # NULL value fails both null-unsafe predicates, sorted order
    assert rows[4] == ["v_positive", "v_small"]


def test_split_gates_on_drop_and_fail_only(spark):
    good, bad = split(_frame(spark), RULES)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    bad_rows = {r["id"]: r["violations"] for r in bad.collect()}
    assert sorted(bad_rows) == [2, 4]
    assert bad_rows[4] == ["v_positive", "v_small"]


def test_enforce_passes_when_fail_rules_hold(spark):
    out = enforce(_frame(spark), RULES)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_enforce_raises_on_fail_breach(spark):
    df = _frame(spark).union(
        spark.createDataFrame([(5, None, 1.0)], "id int, name string, v double")
    )
    with pytest.raises(ExpectationFailedError, match="name_present"):
        enforce(df, RULES)


def test_report_counts_and_rates(spark):
    rows = {
        r["expectation"]: r
        for r in expectation_report(_frame(spark), RULES).collect()
    }
    assert rows["v_positive"]["n_violations"] == 2  # id 2 and NULL id 4
    assert rows["v_small"]["n_violations"] == 2     # id 3 and NULL id 4
    assert rows["name_present"]["n_violations"] == 0
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["name_present"]["pass_rate"] == 1.0
    assert rows["v_positive"]["pass_rate"] == 0.5


def test_report_is_single_pass(spark):
    """All rule counters fold into ONE aggregate: the optimized plan contains
    exactly one scan of the input (no per-rule rescans)."""
    df = _frame(spark)
    plan = expectation_report(df, RULES)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("scan existingrdd") <= 1


def test_duplicate_rule_names_rejected(spark):
    with pytest.raises(ValueError, match="duplicate"):
        annotate(_frame(spark), [RULES[0], Expectation("v_positive", "v > 1")])


def test_bad_action_rejected():
    with pytest.raises(ValueError, match="action"):
        Expectation("x", "v > 0", "explode")


def test_streaming_listener_captures_state_metrics(spark):
    """StreamingMetricsListener must observe the stateful windowed agg: at
    least one batch, all input rows counted, nonzero state, and a final
    watermark — the production signals for watermark misconfiguration."""
    import time

    from lakeflow.observability import StreamingMetricsListener
    from lakeflow.sources.streams import events_stream
    from lakeflow.streaming.candles import streaming_candles
    from lakeflow.streaming.sinks import run_to_memory

    from .conftest import SF_DIR

    listener = StreamingMetricsListener.attach(spark)
    try:
        stream = events_stream(spark, SF_DIR)
        candles = streaming_candles(stream, watermark="1 minutes")
        name, _q = run_to_memory(candles, name="listener_probe")
        # Listener events are delivered asynchronously on the listener bus.
        deadline = time.time() + 30
        while time.time() < deadline:
            s = listener.summary("listener_probe")
            if s["n_batches"] and s["final_watermark"]:
                break
            time.sleep(0.5)
    finally:
        listener.detach()
    from lakeflow.catalog import load_table

    s = listener.summary("listener_probe")
    assert s["n_batches"] >= 1
    assert s["input_rows"] == load_table(spark, SF_DIR, "events").count()
    assert s["max_state_rows"] > 0
    assert s["late_rows_dropped"] == 0  # bounded in-order fixture drops none
    assert s["final_watermark"] is not None


def test_streaming_dead_letter_queue_routes_both_sides(spark, tmp_path):
    """Production gate pattern: one foreachBatch splits each micro-batch on
    the expectation rules — good rows upsert into silver, violations append
    to a dead-letter table WITH their violated-rule list — so bad data is
    never dropped silently and never pollutes silver."""
    from pyspark.sql import functions as F

    from lakeflow.operators.merge import scd1_apply
    from lakeflow.quality import split
    from lakeflow.tables import VersionedTable

    rules = [
        Expectation("value_nonneg", "value >= 0", "drop"),
        Expectation("known_type", "event_type IN ('view', 'click')", "drop"),
    ]
    silver = VersionedTable(spark, str(tmp_path / "silver"))
    dlq = VersionedTable(spark, str(tmp_path / "dlq"))

    def gate_batch(batch_df, batch_id):
        good, bad = split(batch_df, rules)
        state = (
            good
            if silver.current_version() is None
            else scd1_apply(silver.read(), good, keys=["event_id"])
        )
        silver.commit(state, mode="overwrite")
        if not bad.isEmpty():
            dlq.commit(
                bad.withColumn("violated", F.array_join("violations", ","))
                .drop("violations")
            )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "view", 1.0), (2, "spam", 2.0), (3, "click", -5.0)],
        "event_id long, event_type string, value double",
    ).write.parquet(src)
    q = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .parquet(src)
        .writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert [r["event_id"] for r in silver.read().collect()] == [1]
    dlq_rows = {r["event_id"]: r["violated"] for r in dlq.read().collect()}
    assert dlq_rows == {2: "known_type", 3: "value_nonneg"}


def test_streaming_observed_expectation_metrics(spark, tmp_path):
    """annotate_observed counters ride each micro-batch and reach the
    listener's observedMetrics — per-rule violation counts with NO extra
    job, the DLT-event-log metrics path."""
    import time

    from lakeflow.observability import StreamingMetricsListener
    from lakeflow.quality import annotate_observed

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, -2.0), (4, 9.0)], "id long, v double"
    ).write.parquet(src)
    rules = [Expectation("v_nonneg", "v >= 0", "warn")]

    listener = StreamingMetricsListener.attach(spark)
    try:
        stream = spark.readStream.schema("id long, v double").parquet(src)
        observed = annotate_observed(stream, rules, name="gate")
        q = (
            observed.writeStream.format("memory")
            .queryName("obs_probe")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        deadline = time.time() + 30
        while time.time() < deadline:
            s = listener.summary("obs_probe")
            if s["observed_totals"].get("gate"):
                break
            time.sleep(0.5)
    finally:
        listener.detach()
    gate = listener.summary("obs_probe")["observed_totals"]["gate"]
    assert gate["rows"] == 4
    assert gate["violations_v_nonneg"] == 2
