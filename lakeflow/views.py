"""Incrementally-maintained aggregate materialized views.

The reference's gold layer recomputes its aggregates from silver on every run
(/root/reference/src/gold/load_to_gold.py — a full groupBy per trigger);
Databricks DLT materialized views and Materialize/DBSP keep them fresh by
processing only the CHANGE since last refresh. This module re-creates that
contract on :class:`lakeflow.tables.VersionedTable` metadata alone:

- The base table's manifests say exactly which data directories a version
  added and removed. A refresh reads ONLY those dirs — removed rows enter
  the aggregation with sign −1, added rows with +1 — and folds the signed
  partial into the stored view state. Refresh IO is proportional to the
  churn between versions, never to the base table (100 TB base, MB-scale
  refresh for an append-mostly table).
- Aggregates are restricted to the self-inverting (abelian-group) kind —
  COUNT(*) and fixed-point SUM — because those are the ones where
  "subtract the removed rows" is exact. Per-row values are quantized to
  integer units (``floor(x * scale + 0.5)``) BEFORE summation, so the
  running totals are addition-order-free: an incremental refresh and a
  from-scratch rebuild produce bit-identical state, which is what makes
  the view oracle-checkable. AVG derives as sum/count at read time.
- MIN/MAX are not group-invertible; :class:`DirtyGroupAggView` is their
  tier — it uses the manifest diff only to find the DIRTY group keys and
  re-aggregates exactly those groups from the current base, pruned by the
  per-dir key stats (the same incremental/recompute line DLT draws, with
  the recompute scoped to touched groups instead of the whole view).

Copy-on-write DML composes for free: ``delete_where``/``update_where``
carry untouched dirs over (absent from the diff) and rewrite only candidate
dirs (old dir → −1, rewritten dir → +1), so the refresh prices the DML's
actual churn. An overwrite commit degenerates to remove-all + add-all —
correct, just no longer cheap — and ``compact`` nets to zero change per
group.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.tables import VersionedTable


class IncrementalAggView:
    """A keyed COUNT/SUM aggregate over a base :class:`VersionedTable`,
    refreshed from manifest diffs.

    ``sums`` maps output column → (source column, scale): each row
    contributes ``floor(src * scale + 0.5)`` as a BIGINT, summed per key.
    ``count_col`` is the per-key COUNT(*). State lives in its own
    VersionedTable (itself time-travelable), and the high-watermark base
    version is recorded in a sidecar marker written via temp-file rename.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: VersionedTable,
        keys: Sequence[str],
        sums: Mapping[str, tuple[str, int]],
        path: str,
        count_col: str = "n_rows",
    ) -> None:
        self.spark = spark
        self.base = base
        self.keys = list(keys)
        self.sums = dict(sums)
        self.count_col = count_col
        self.result = VersionedTable(spark, path)
        self._marker_path = os.path.join(path, "_mv_state.json")

    # -- marker ------------------------------------------------------------
    def refreshed_version(self) -> int | None:
        """Base-table version the view state currently reflects."""
        if not os.path.exists(self._marker_path):
            return None
        with open(self._marker_path) as fh:
            return json.load(fh)["base_version"]

    def _write_marker(self, base_version: int) -> None:
        tmp = self._marker_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"base_version": base_version}, fh)
        os.replace(tmp, self._marker_path)

    # -- refresh -----------------------------------------------------------
    def _signed_partial(self, delta: DataFrame) -> DataFrame:
        aggs = [F.sum("__sign").cast("bigint").alias(self.count_col)]
        for out, (src, scale) in self.sums.items():
            unit = F.floor(F.col(src) * scale + F.lit(0.5)).cast("bigint")
            aggs.append(F.sum(unit * F.col("__sign")).cast("bigint").alias(out))
        return delta.groupBy(*self.keys).agg(*aggs)

    def refresh(self) -> dict:
        """Fold base-table changes since the last refresh into the view.

        Returns {"from_version", "to_version", "dirs_read", "dirs_total"} —
        callers (and tests) can assert the incremental contract:
        ``dirs_read`` counts only the dirs the base diff touched.
        """
        v_to = self.base.current_version()
        if v_to is None:
            raise ValueError("base table has no snapshots")
        v_from = self.refreshed_version()
        dirs_total = len(self.base._manifest(v_to)["dirs"])
        if v_from == v_to:
            return {
                "from_version": v_from,
                "to_version": v_to,
                "dirs_read": 0,
                "dirs_total": dirs_total,
            }

        if v_from is not None:
            try:
                old_dirs = self.base._manifest(v_from)["dirs"]
            except FileNotFoundError:
                # The snapshot this view last saw has been expired out from
                # under us (expire_snapshots ran between refreshes). The
                # diff is unrecoverable — fall back to a full rebuild, the
                # same answer Delta gives a stale streaming reader.
                v_from = None
        if v_from is None:
            added = self.base._manifest(v_to)["dirs"]
            removed: list[str] = []
            if self.result.current_version() is not None:
                # Rebuild replaces, never folds onto, the stale state.
                self.result.commit(
                    self.result.read().limit(0), mode="overwrite",
                    _operation="mv_reset",
                )
        else:
            new_dirs = self.base._manifest(v_to)["dirs"]
            old_set, new_set = set(old_dirs), set(new_dirs)
            added = [d for d in new_dirs if d not in old_set]
            removed = [d for d in old_dirs if d not in new_set]

        parts = []
        if added:
            parts.append(
                self.base._read_dirs(added, v_to).withColumn(
                    "__sign", F.lit(1).cast("bigint")
                )
            )
        if removed:
            parts.append(
                self.base._read_dirs(removed, v_from).withColumn(
                    "__sign", F.lit(-1).cast("bigint")
                )
            )
        if not parts:
            self._write_marker(v_to)
            return {
                "from_version": v_from,
                "to_version": v_to,
                "dirs_read": 0,
                "dirs_total": dirs_total,
            }
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        partial = self._signed_partial(delta)

        if self.result.current_version() is None:
            merged = partial
        else:
            state = self.result.read()
            val_cols = [self.count_col, *self.sums.keys()]
            if self.keys:
                s = state.select(
                    *self.keys, *[F.col(c).alias(f"__s_{c}") for c in val_cols]
                )
                p = partial.select(
                    *self.keys, *[F.col(c).alias(f"__p_{c}") for c in val_cols]
                )
                merged = s.join(p, on=self.keys, how="full_outer").select(
                    *self.keys,
                    *[
                        (
                            F.coalesce(F.col(f"__s_{c}"), F.lit(0))
                            + F.coalesce(F.col(f"__p_{c}"), F.lit(0))
                        )
                        .cast("bigint")
                        .alias(c)
                        for c in val_cols
                    ],
                )
            else:
                # Keyless (global) view: integer sums fold by union+re-sum.
                merged = (
                    state.select(*val_cols)
                    .unionByName(partial.select(*val_cols))
                    .agg(
                        *[
                            F.sum(c).cast("bigint").alias(c)
                            for c in val_cols
                        ]
                    )
                )
        # Groups whose every row was deleted leave the view entirely.
        merged = merged.filter(F.col(self.count_col) > 0)
        self.result.commit(merged, mode="overwrite", _operation="mv_refresh")
        self._write_marker(v_to)
        return {
            "from_version": v_from,
            "to_version": v_to,
            "dirs_read": len(added) + len(removed),
            "dirs_total": dirs_total,
        }

    def read(self) -> DataFrame:
        """Current view state (keys, count, fixed-point sums)."""
        return self.result.read()


class DirtyGroupAggView:
    """The recompute-on-change materialized-view tier for NON-invertible
    aggregates (MIN/MAX — a delete of the group's extremum cannot be
    "subtracted" the way :class:`IncrementalAggView` folds COUNT/SUM).

    A refresh diffs the base manifests exactly like the invertible tier,
    but uses the delta only to find the DIRTY group keys; those groups are
    then re-aggregated from the current base and spliced over the stored
    state (untouched groups carry over verbatim). The re-read prunes with
    the manifest's per-dir min/max stats on the group key: only dirs whose
    key range admits a dirty key are opened, so a base committed in
    key-banded dirs re-reads one band per dirty band, not the table — the
    same file-skipping the row-level DML path uses. Without key stats it
    degrades to one filtered scan of the base, still only once per refresh.

    This is precisely the incremental/recompute line DLT draws: COUNT/SUM
    views fold deltas, MIN/MAX views recompute — but scoped to the groups
    the delta actually touched.

    ``sums``/``mins``/``maxs`` map output column → (source column, scale);
    all values land as fixed-point BIGINTs so state is engine-replayable.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: VersionedTable,
        key: str,
        path: str,
        count_col: str = "n_rows",
        sums: Mapping[str, tuple[str, int]] | None = None,
        mins: Mapping[str, tuple[str, int]] | None = None,
        maxs: Mapping[str, tuple[str, int]] | None = None,
        max_dirty_collect: int = 100_000,
    ) -> None:
        self.spark = spark
        self.base = base
        self.key = key
        self.sums = dict(sums or {})
        self.mins = dict(mins or {})
        self.maxs = dict(maxs or {})
        self.count_col = count_col
        self.max_dirty_collect = max_dirty_collect
        self.result = VersionedTable(spark, path)
        self._marker_path = os.path.join(path, "_mv_state.json")

    refreshed_version = IncrementalAggView.refreshed_version
    _write_marker = IncrementalAggView._write_marker
    read = IncrementalAggView.read

    def _aggs(self):
        def unit(src: str, scale: int):
            return F.floor(F.col(src) * scale + F.lit(0.5)).cast("bigint")

        aggs = [F.count(F.lit(1)).cast("bigint").alias(self.count_col)]
        for out, (src, scale) in self.sums.items():
            aggs.append(F.sum(unit(src, scale)).cast("bigint").alias(out))
        for out, (src, scale) in self.mins.items():
            aggs.append(F.min(unit(src, scale)).cast("bigint").alias(out))
        for out, (src, scale) in self.maxs.items():
            aggs.append(F.max(unit(src, scale)).cast("bigint").alias(out))
        return aggs

    def refresh(self) -> dict:
        v_to = self.base.current_version()
        if v_to is None:
            raise ValueError("base table has no snapshots")
        v_from = self.refreshed_version()
        m_to = self.base._manifest(v_to)
        dirs_total = len(m_to["dirs"])
        if v_from == v_to:
            return {"from_version": v_from, "to_version": v_to,
                    "dirs_read": 0, "dirs_total": dirs_total}

        if v_from is not None:
            try:
                self.base._manifest(v_from)
            except FileNotFoundError:
                # Last-seen snapshot expired between refreshes: the dirty
                # set is unrecoverable, rebuild from the current base.
                v_from = None
        if v_from is None:
            # First build (or post-expiry rebuild): full aggregate.
            state = self.base.read().groupBy(self.key).agg(*self._aggs())
            self.result.commit(state, mode="overwrite", _operation="mv_build")
            self._write_marker(v_to)
            return {"from_version": None, "to_version": v_to,
                    "dirs_read": dirs_total, "dirs_total": dirs_total}

        old_dirs = self.base._manifest(v_from)["dirs"]
        new_dirs = m_to["dirs"]
        old_set, new_set = set(old_dirs), set(new_dirs)
        added = [d for d in new_dirs if d not in old_set]
        removed = [d for d in old_dirs if d not in new_set]
        if not added and not removed:
            self._write_marker(v_to)
            return {"from_version": v_from, "to_version": v_to,
                    "dirs_read": 0, "dirs_total": dirs_total}

        parts = []
        if added:
            parts.append(self.base._read_dirs(added, v_to).select(self.key))
        if removed:
            parts.append(self.base._read_dirs(removed, v_from).select(self.key))
        delta_keys = parts[0]
        for p in parts[1:]:
            delta_keys = delta_keys.unionByName(p)
        dirty = [
            r[0]
            for r in delta_keys.distinct().limit(self.max_dirty_collect + 1).collect()
        ]
        if len(dirty) > self.max_dirty_collect:
            # Churn touched more groups than worth enumerating: rebuild.
            state = self.base.read().groupBy(self.key).agg(*self._aggs())
            self.result.commit(state, mode="overwrite", _operation="mv_rebuild")
            self._write_marker(v_to)
            return {"from_version": v_from, "to_version": v_to,
                    "dirs_read": dirs_total, "dirs_total": dirs_total}

        # Stats-pruned re-read: open only dirs whose key range admits a
        # dirty key (dirs without stats always qualify — no false skips).
        stats = m_to.get("stats", {})
        if any(self.key in s for s in stats.values()):
            kept = sorted(
                {
                    d
                    for v in dirty
                    for d in self.base._kept_dirs(m_to, {self.key: (v, v)})
                }
            )
        else:
            kept = list(m_to["dirs"])
        recomputed = (
            self.base._read_dirs(kept, v_to)
            .filter(F.col(self.key).isin(dirty))
            .groupBy(self.key)
            .agg(*self._aggs())
        )
        carried = self.result.read().filter(~F.col(self.key).isin(dirty))
        state = carried.unionByName(recomputed)
        self.result.commit(state, mode="overwrite", _operation="mv_refresh")
        self._write_marker(v_to)
        return {
            "from_version": v_from,
            "to_version": v_to,
            "dirs_read": len(added) + len(removed) + len(kept),
            "dirs_total": dirs_total,
            "dirty_groups": len(dirty),
        }
