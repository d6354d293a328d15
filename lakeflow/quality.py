"""Declarative data-quality expectations over DataFrames (batch + streaming).

The reference's silver layer hand-rolls its row gating — drop-null /
dedup / cast-validity filters inline in each transform
(/root/reference/src/silver/_silver_utils.py: cleaning helpers;
SURVEY.md §2.3 P4-P8). This module lifts that into the declarative
expectations contract lakehouse pipelines standardize on (Delta Live
Tables' ``EXPECT ... ON VIOLATION``, Great Expectations): each rule is a
named SQL predicate plus an action, and the engine derives the gate, the
quarantine, and the audit metrics from one spec.

Actions:

* ``warn``  — keep the row, count the violation (audit only).
* ``drop``  — remove the row from the good output; it lands in quarantine.
* ``fail``  — like drop, but :func:`enforce` raises if any row violates
  (circuit breaker for contract-level invariants).

Scale shape: every predicate is a Catalyst boolean expression evaluated
scan-side — :func:`annotate` adds one array column inside the scan's
whole-stage-codegen span, no shuffle, no UDF. :func:`expectation_report`
folds ALL rule counters into a single one-row aggregate (one pass, one
partial-agg exchange of one row per partition); it never runs one job per
rule. The split paths (:func:`split`) are two filters over the same scan —
at 100 TB each output is written once and the scan cost dominates, the
same IO shape DLT's expectations produce.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.rounding import rnd

VIOLATIONS_COL = "violations"

_ACTIONS = ("warn", "drop", "fail")


@dataclass(frozen=True)
class Expectation:
    """One named data-quality rule.

    ``predicate`` is a SQL boolean expression over the frame's columns;
    a row PASSES when the predicate is TRUE. NULL evaluates as a
    violation (SQL three-valued logic would otherwise let NULL rows slip
    through every gate — the standard DLT/CHECK-constraint trap).
    """

    name: str
    predicate: str
    action: str = "warn"

    def __post_init__(self) -> None:
        if self.action not in _ACTIONS:
            raise ValueError(
                f"action must be one of {_ACTIONS}, got {self.action!r}"
            )

    def passes(self) -> Column:
        # Null-safe: NULL predicate result counts as a violation.
        return F.coalesce(F.expr(self.predicate), F.lit(False))


def _check_names(expectations: list[Expectation]) -> None:
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names in {names}")


def annotate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Add ``violations``: the sorted array of rule names this row fails
    (all actions included — warn rules annotate but never gate). Pure
    scan-side projection; the hot path stays in whole-stage codegen."""
    _check_names(expectations)
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(~e.passes(), F.lit(e.name))
                    for e in expectations
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return df.withColumn(VIOLATIONS_COL, failed)


def gate(expectations: list[Expectation]) -> Column:
    """The row-level keep predicate: TRUE iff no drop/fail rule is violated."""
    keep = F.lit(True)
    for e in expectations:
        if e.action in ("drop", "fail"):
            keep = keep & e.passes()
    return keep


def split(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows pass every drop/fail rule; quarantined
    rows carry the ``violations`` array naming every rule they fail (warn
    included, for audit). Two filters over one scan — write each side once.
    """
    _check_names(expectations)
    keep = gate(expectations)
    good = df.filter(keep)
    bad = annotate(df, expectations).filter(~keep)
    return good, bad


class ExpectationFailedError(RuntimeError):
    """Raised by :func:`enforce` when a ``fail`` rule has violations."""


def enforce(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Return the gated frame after verifying no ``fail`` rule is breached.

    The breach check is ONE one-row aggregate over the input (same single
    pass as :func:`expectation_report`); it runs eagerly so the contract
    fires at enforce time, not when some downstream action happens to
    materialize the plan.
    """
    _check_names(expectations)
    fails = [e for e in expectations if e.action == "fail"]
    if fails:
        row = df.agg(
            *[
                F.sum((~e.passes()).cast("bigint")).alias(e.name)
                for e in fails
            ]
        ).collect()[0]
        breached = {e.name: row[e.name] for e in fails if (row[e.name] or 0) > 0}
        if breached:
            raise ExpectationFailedError(
                f"fail-level expectations breached: {breached}"
            )
    return df.filter(gate(expectations))


def expectation_report(
    df: DataFrame, expectations: list[Expectation], round_to: int = 6
) -> DataFrame:
    """Per-rule audit metrics: (expectation, action, n_rows, n_violations,
    pass_rate), one output row per rule, ordered by rule name.

    One aggregate pass computes every counter (each rule is one
    conditional-sum slot in the same partial agg); the per-rule layout is
    an unpivot of that single row — the report never rescans the input per
    rule, the property that matters when the input is a 100 TB scan.
    """
    _check_names(expectations)
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum((~e.passes()).cast("bigint")).alias(f"__v_{e.name}")
            for e in expectations
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.lit(e.action).alias("action"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{e.name}").alias("n_violations"),
            )
            for e in expectations
        ]
    )
    exploded = agg.select(F.explode(rows).alias("r")).select("r.*")
    return exploded.select(
        "expectation",
        "action",
        "n_rows",
        "n_violations",
        rnd(
            (F.col("n_rows") - F.col("n_violations"))
            / F.col("n_rows").cast("double"),
            round_to,
        ).alias("pass_rate"),
    ).orderBy("expectation")


def annotate_observed(
    df: DataFrame, expectations: list[Expectation], name: str = "expectations"
) -> DataFrame:
    """Attach per-rule violation counters to the frame via ``df.observe`` —
    the STREAMING metrics path: counters ride every micro-batch's execution
    (no extra pass, no extra job) and surface in each QueryProgressEvent's
    ``observedMetrics[name]``, where a listener (e.g.
    ``lakeflow.observability.StreamingMetricsListener``) or alerting hook
    reads them. This is how DLT's event log gets its expectation counts.

    Works on batch frames too (metrics ride whatever action materializes
    the plan). Pair with :func:`gate`/:func:`split` — observation does not
    filter.
    """
    _check_names(expectations)
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        *[
            F.sum((~e.passes()).cast("bigint")).alias(f"violations_{e.name}")
            for e in expectations
        ],
    )


def distribution_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 10,
    bucket_width: int = 64,
    threshold_micro: int = 100_000,
) -> DataFrame:
    """Per-group distribution drift vs the rest of the corpus: total
    variation distance between each group's bucketed histogram of
    ``value_col`` and the histogram of everything else — the monitoring
    check a pipeline runs when a new crawl snapshot or source lands, before
    letting it into the training mix (a PSI-style drift gate, but TV
    distance so the whole computation stays in integer micro-units:
    p and q quantize to floor(count * 1e6 / total) and the statistic is
    sum(|p-q|)/2 — bit-exact across engines and summation orders, which a
    float PSI's ln() cannot promise).

    Buckets are fixed-width (``least(n_buckets-1, value // bucket_width)``),
    so bucketing is scan-side and the (group x bucket) grid — built by a
    cross join of two tiny distinct frames so empty cells count zero — is
    the only shuffle-bearing state: |groups| x n_buckets rows, regardless
    of corpus size. Returns one row per group: total docs, TV distance in
    micro-units, and the ``drifted`` flag at ``threshold_micro``
    (0.1 by default).
    """
    from pyspark.sql import functions as F

    bucket = F.least(
        F.lit(n_buckets - 1), (F.col(value_col) / bucket_width).cast("bigint")
    )
    counts = (
        df.select(F.col(group_col).alias("grp"), bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    grid = (
        counts.select("grp")
        .distinct()
        .crossJoin(F.broadcast(df.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))))
    )
    full = grid.join(counts, ["grp", "bucket"], "left").fillna(0, ["cnt"])
    tot = full.groupBy("grp").agg(F.sum("cnt").cast("bigint").alias("grp_total"))
    gtot = full.agg(F.sum("cnt")).first()[0]
    per_bucket_global = (
        full.groupBy("bucket").agg(F.sum("cnt").cast("bigint").alias("all_cnt"))
    )
    j = (
        full.join(tot, "grp")
        .join(F.broadcast(per_bucket_global), "bucket")
        .withColumn("rest_cnt", F.col("all_cnt") - F.col("cnt"))
        .withColumn("rest_total", F.lit(int(gtot)) - F.col("grp_total"))
        # integer `div`, not float floor: cnt * 1e6 can pass 2^53 at corpus
        # scale, where double division silently loses exactness
        .withColumn("p_micro", F.expr("(cnt * 1000000L) div grp_total"))
        .withColumn("q_micro", F.expr("(rest_cnt * 1000000L) div rest_total"))
    )
    return (
        j.groupBy("grp")
        .agg(
            F.max("grp_total").alias("n_docs"),
            (F.sum(F.abs(F.col("p_micro") - F.col("q_micro"))) / 2)
            .cast("bigint")
            .alias("tv_micro"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "tv_micro",
            (F.col("tv_micro") > threshold_micro).alias("drifted"),
        )
    )
