"""SCD Type 1 / Type 2 merge semantics (SURVEY.md §2.9 M1-M3).

The reference implements these as Iceberg ``MERGE INTO`` statements
(/root/reference/src/silver/_silver_utils.py:108-186). Plain Spark SQL has no
MERGE without a lakehouse format, so this module provides the pure-DataFrame
re-expression: given the current target state and a source batch, produce the
*next* target state. With Iceberg/Delta present the same semantics map 1:1 onto
two MERGE statements (SCD2) / one MERGE (SCD1); the DataFrame form is what the
oracle can verify and what a partitioned-overwrite writer can persist.

Scale: both merges are a single equi-join of target×source on the natural key
(broadcast when the source batch is small — the common CDC case) plus a union.
No window functions, no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD2_COLS = ("start_timestamp", "end_timestamp", "is_current")


def _any_tracked_differs(tracked: Sequence[str]) -> Column:
    """Null-safe change predicate: NOT (src.c <=> tgt.c) for any tracked col
    (reference _silver_utils.py:122 uses the same <=> idiom)."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}"))
    return cond


def _dedup_source(
    df: DataFrame, keys: Sequence[str], seq_col: str | None
) -> DataFrame:
    """Collapse a CDC batch to one row per key before merging.

    SQL ``MERGE INTO`` *errors* when several source rows match one target row;
    a DataFrame merge would silently insert duplicates instead. When the batch
    carries an ordering column (``seq_col`` — commit LSN, batch sequence,
    event ts) the latest row wins; otherwise the winner is a deterministic
    max over the remaining columns (stable across retries and engines, unlike
    dropDuplicates' arrival order).
    """
    from pyspark.sql import Window

    others = [c for c in df.columns if c not in keys]
    order = [F.desc(seq_col)] if seq_col else []
    if others:
        order.append(F.desc(F.struct(*others)))  # deterministic tiebreak
    if not order:
        order = [F.desc(keys[0])]  # key-only frame: rows are identical anyway
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd1_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    seq_col: str | None = None,
) -> DataFrame:
    """SCD Type 1 upsert: matched rows take source values, unmatched source rows
    insert, target-only rows survive (reference merge_scd1,
    _silver_utils.py:157-186).

    Equivalent to ``MERGE INTO t USING s ON keys WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *``. The source batch is first collapsed to
    one row per key (``seq_col`` picks the winner when given) — a multi-row-
    per-key CDC batch would otherwise insert duplicate key rows, which MERGE
    would reject outright. The anti-join is null-safe, matching the generated
    MERGE's ``<=>`` ON clause: a NULL key updates its NULL counterpart rather
    than duplicating it (pinned by tests/test_merge_sql_execution.py).
    """
    source = _dedup_source(source, keys, seq_col)
    untouched = target.alias("t").join(
        source.select(*keys).alias("s"),
        on=[F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        how="left_anti",
    )
    return untouched.unionByName(source.select(*target.columns))


def scd2_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective_ts: str,
    seq_col: str | None = None,
) -> DataFrame:
    """SCD Type 2 two-phase merge → next full state (reference merge_scd2,
    _silver_utils.py:108-153).

    ``target`` carries SCD2 columns (start_timestamp, end_timestamp,
    is_current); ``source`` carries the natural columns only. Phase 1 expires
    current rows whose tracked columns differ null-safely from the source;
    phase 2 inserts a new current version for every source row that no longer
    has a current match (changed keys + brand-new keys).

    ``effective_ts`` is an explicit timestamp literal (the reference uses
    ``current_timestamp()``, which is nondeterministic; an explicit load time
    is also what a production backfill needs).
    """
    natural = [c for c in target.columns if c not in SCD2_COLS]
    source = _dedup_source(source, keys, seq_col)
    # Presence markers instead of key-null tests: a current row whose first
    # key column is legitimately NULL must not be classified as absent (that
    # would silently drop it from the next state). The join itself is
    # null-safe so NULL keys match NULL keys, mirroring MERGE ON t.k <=> s.k.
    cur = (
        target.filter(F.col("is_current") == 1)
        .withColumn("__t_present", F.lit(1))
        .alias("t")
    )
    hist = target.filter(F.col("is_current") != 1)
    s = source.withColumn("__s_present", F.lit(1)).alias("s")

    # One join computes both phases' classification.
    joined = cur.join(
        s,
        on=[F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        how="full_outer",
    )
    changed = _any_tracked_differs(tracked)
    t_key_present = F.col("t.__t_present").isNotNull()
    s_key_present = F.col("s.__s_present").isNotNull()

    eff = F.lit(effective_ts).cast("timestamp")

    # Current target rows: expire when matched-and-changed, else keep as-is.
    kept_or_expired = joined.filter(t_key_present).select(
        *[F.col(f"t.{c}").alias(c) for c in natural],
        F.col("t.start_timestamp").alias("start_timestamp"),
        F.when(s_key_present & changed, eff)
        .otherwise(F.col("t.end_timestamp"))
        .alias("end_timestamp"),
        F.when(s_key_present & changed, F.lit(0))
        .otherwise(F.col("t.is_current"))
        .cast("int")
        .alias("is_current"),
    )

    # Source rows needing a new current version: changed keys + new keys.
    inserts = joined.filter(s_key_present & (~t_key_present | changed)).select(
        *[F.col(f"s.{c}").alias(c) for c in natural],
        eff.alias("start_timestamp"),
        F.lit(None).cast("timestamp").alias("end_timestamp"),
        F.lit(1).cast("int").alias("is_current"),
    )

    return (
        hist.select(*natural, *SCD2_COLS)
        .unionByName(kept_or_expired)
        .unionByName(inserts)
    )


def apply_changes(
    target: DataFrame | None,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Ordered changefeed application (the APPLY CHANGES INTO shape, M-layer
    generalization of scd1_apply): ``changes`` carries upserts and deletes
    with a per-key ordering column; the result is the target state AFTER the
    whole feed — latest change wins per key, and a key whose latest change is
    a delete is absent.

    ``target=None`` applies the feed to an empty table (initial hydration).
    Out-of-order delivery is handled by ``seq_col`` (ties broken on the
    payload, mirroring _dedup_source): reordering a feed never changes the
    result, the property CDC pipelines actually need.

    Scale: one ranked dedup of the batch (window over keys — the batch, not
    the table) + one key equi-join against the target. No global sort.
    """
    from lakeflow.operators.transforms import dedup_latest

    payload_cols = [
        c for c in changes.columns if c not in (*keys, seq_col, op_col)
    ]
    latest = dedup_latest(
        changes, list(keys), seq_col, tiebreak_cols=[op_col, *payload_cols]
    )
    survivors = latest.filter(F.col(op_col) != delete_op).select(
        *keys, *payload_cols
    )
    if target is None:
        return survivors
    untouched = target.join(latest.select(*keys), list(keys), "left_anti")
    return untouched.unionByName(survivors)
