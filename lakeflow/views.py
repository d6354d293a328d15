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
correct, just no longer cheap.

Merge-on-read DML changes visibility through DELETION VECTORS, not dirs, so
the refresh also diffs the manifests' vector lists: rows hidden by vectors
added since the last refresh fold in with sign −1 (``_dv_preimages`` — the
invertible tier) or mark their groups dirty (the recompute tier). Vectors
that DISAPPEAR with dirs intact (RESTORE past a MOR delete) resurface rows
in place and have no incremental rendering — that forces a rebuild, as does
compaction (whose dir diff is full-churn anyway, so the rebuild costs the
same scan the fold would).
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.tables import VersionedTable

# App id under which view state commits record the reflected base version
# as a transactional watermark (see ``IncrementalAggView.refreshed_version``).
_MV_TXN_APP = "mv"


def _dv_preimages(
    base: VersionedTable,
    old_m: dict,
    new_m: dict,
    v_to: int,
) -> tuple[DataFrame | None, int]:
    """Pre-image rows hidden by deletion vectors added between two snapshots.

    Merge-on-read DML changes row visibility WITHOUT touching the dir list,
    so a dirs-only manifest diff misses it entirely (a ``delete_where_mor``
    would leave the deleted rows' contributions in the view forever). This
    recovers the rows the new vectors hid — the refresh folds them with
    sign −1 — by raw-reading ONLY the referenced dirs (no DV masking) and
    broadcast-semi-joining the new vectors' positions, the same split shape
    as the CDF reader's delete pre-image partitions
    (``sources/table_stream.py``).

    Restricted to dirs present in BOTH snapshots: positions in dirs added
    within the window are already excluded by the added-dir read (which
    anti-joins the target version's vectors), and positions in removed dirs
    are subtracted wholesale by the removed-dir read.

    Returns ``(pre_image_rows_or_None, n_dirs_read)``.
    """
    dvs_from = old_m.get("delete_vectors", [])
    dvs_to = new_m.get("delete_vectors", [])
    new_dvs = [p for p in dvs_to if p not in set(dvs_from)]
    if not new_dvs:
        return None, 0
    dv = base.spark.read.parquet(*new_dvs).select("file_path", "row_index")
    common = set(old_m["dirs"]) & set(new_m["dirs"])
    # Distinct referenced FILES are bounded by the table's file count (the
    # same metadata scale Delta's log tracks), so mapping them to owning
    # dirs is a driver-side loop over metadata, never data.
    # Boundary-safe containment (dir + "/"), via contains not startswith:
    # _metadata-derived paths carry a scheme prefix (file:/…) the manifest
    # dirs lack, and a dir must not capture a sibling it is a prefix of.
    files = [r[0] for r in dv.select("file_path").distinct().collect()]
    ref = sorted(
        d
        for d in common
        if any(d.rstrip("/") + "/" in f for f in files)
    )
    if not ref:
        return None, 0
    pre = base._read_dirs(ref, v_to, with_positions=True, dvs=[])
    hidden = pre.join(
        F.broadcast(dv),
        (pre[base.POS_FILE] == dv["file_path"])
        & (pre[base.POS_INDEX] == dv["row_index"]),
        "left_semi",
    )
    payload = [
        c for c in pre.columns if c not in (base.POS_FILE, base.POS_INDEX)
    ]
    return hidden.select(*payload), len(ref)


class IncrementalAggView:
    """A keyed COUNT/SUM aggregate over a base :class:`VersionedTable`,
    refreshed from manifest diffs.

    ``sums`` maps output column → (source column, scale): each row
    contributes ``floor(src * scale + 0.5)`` as a BIGINT, summed per key.
    ``count_col`` is the per-key COUNT(*). State lives in its own
    VersionedTable (itself time-travelable); the high-watermark base
    version rides inside each state commit as a ``("mv", version)`` txn
    watermark (atomic with the state), with a sidecar marker only as the
    empty-delta fast path.
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

    # -- watermark ---------------------------------------------------------
    def refreshed_version(self) -> int | None:
        """Base-table version the view state currently reflects.

        Authoritative source: the ``("mv", version)`` transactional
        watermark recorded INSIDE the state commit — watermark and state
        land in one atomic manifest publish, so a crash between them cannot
        leave state at ``v_to`` with the watermark at ``v_from`` (which
        would re-fold the same delta and double-count on the next refresh).
        The sidecar marker survives only as the empty-delta fast path
        (nothing to commit, so no manifest to carry the txn); taking the
        max of the two is safe because the sidecar is written only for
        versions whose delta was empty.
        """
        vals = []
        rv = self.result.current_version()
        if rv is not None:
            t = self.result._manifest(rv).get("txns", {}).get(_MV_TXN_APP)
            if t is not None:
                vals.append(int(t))
        if os.path.exists(self._marker_path):
            with open(self._marker_path) as fh:
                vals.append(int(json.load(fh)["base_version"]))
        return max(vals) if vals else None

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
        m_to = self.base._manifest(v_to)
        dirs_total = len(m_to["dirs"])
        if v_from == v_to:
            return {
                "from_version": v_from,
                "to_version": v_to,
                "dirs_read": 0,
                "dirs_total": dirs_total,
            }

        old_m: dict | None = None
        if v_from is not None:
            try:
                old_m = self.base._manifest(v_from)
            except FileNotFoundError:
                # The snapshot this view last saw has been expired out from
                # under us (expire_snapshots ran between refreshes). The
                # diff is unrecoverable — fall back to a full rebuild, the
                # same answer Delta gives a stale streaming reader.
                v_from = None
        if old_m is not None and any(
            p not in set(m_to.get("delete_vectors", []))
            for p in old_m.get("delete_vectors", [])
        ):
            # Deletion vectors DISAPPEARED since the last refresh (RESTORE
            # past a MOR delete resurfaces hidden rows in place; compaction
            # purges vectors while replacing every dir). There is no cheaper
            # incremental rendering than re-aggregating — and for compaction
            # the dir diff is full-churn anyway, so the rebuild costs the
            # same scan the fold would.
            v_from, old_m = None, None

        dv_delta: DataFrame | None = None
        dv_dirs_read = 0
        if v_from is None:
            added = m_to["dirs"]
            removed: list[str] = []
        else:
            new_dirs = m_to["dirs"]
            old_set, new_set = set(old_m["dirs"]), set(new_dirs)
            added = [d for d in new_dirs if d not in old_set]
            removed = [d for d in old_m["dirs"] if d not in new_set]
            dv_delta, dv_dirs_read = _dv_preimages(self.base, old_m, m_to, v_to)

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
        if dv_delta is not None:
            parts.append(
                dv_delta.withColumn("__sign", F.lit(-1).cast("bigint"))
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

        if v_from is None or self.result.current_version() is None:
            # Rebuild (or first build) REPLACES state in one atomic commit —
            # never a reset-then-fold pair, whose crash window would leave
            # an empty state behind a still-valid watermark.
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
        # The reflected base version rides INSIDE the commit as a txn
        # watermark — state and watermark publish atomically, and a replay
        # of the same refresh (txn_version <= recorded) is skipped.
        self.result.commit(
            merged,
            mode="overwrite",
            _operation="mv_refresh" if v_from is not None else "mv_build",
            txn=(_MV_TXN_APP, v_to),
        )
        self._write_marker(v_to)
        return {
            "from_version": v_from,
            "to_version": v_to,
            "dirs_read": len(added) + len(removed) + dv_dirs_read,
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

        old_m: dict | None = None
        if v_from is not None:
            try:
                old_m = self.base._manifest(v_from)
            except FileNotFoundError:
                # Last-seen snapshot expired between refreshes: the dirty
                # set is unrecoverable, rebuild from the current base.
                v_from = None
        if old_m is not None and any(
            p not in set(m_to.get("delete_vectors", []))
            for p in old_m.get("delete_vectors", [])
        ):
            # Vectors disappeared (RESTORE / compaction): hidden rows
            # resurface in place — no incremental dirty set exists.
            v_from, old_m = None, None
        if v_from is None:
            # First build (or post-expiry/post-restore rebuild): full
            # aggregate in ONE atomic commit carrying the watermark.
            state = self.base.read().groupBy(self.key).agg(*self._aggs())
            self.result.commit(
                state, mode="overwrite", _operation="mv_build",
                txn=(_MV_TXN_APP, v_to),
            )
            self._write_marker(v_to)
            return {"from_version": None, "to_version": v_to,
                    "dirs_read": dirs_total, "dirs_total": dirs_total}

        old_dirs = old_m["dirs"]
        new_dirs = m_to["dirs"]
        old_set, new_set = set(old_dirs), set(new_dirs)
        added = [d for d in new_dirs if d not in old_set]
        removed = [d for d in old_dirs if d not in new_set]
        # Merge-on-read DML adds deletion vectors without touching dirs —
        # the rows they hid are dirty too (their group's extremum may have
        # been the deleted row).
        dv_delta, dv_dirs_read = _dv_preimages(self.base, old_m, m_to, v_to)
        if not added and not removed and dv_delta is None:
            self._write_marker(v_to)
            return {"from_version": v_from, "to_version": v_to,
                    "dirs_read": 0, "dirs_total": dirs_total}

        parts = []
        if added:
            parts.append(self.base._read_dirs(added, v_to).select(self.key))
        if removed:
            parts.append(self.base._read_dirs(removed, v_from).select(self.key))
        if dv_delta is not None:
            parts.append(dv_delta.select(self.key))
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
            self.result.commit(
                state, mode="overwrite", _operation="mv_rebuild",
                txn=(_MV_TXN_APP, v_to),
            )
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
        self.result.commit(
            state, mode="overwrite", _operation="mv_refresh",
            txn=(_MV_TXN_APP, v_to),
        )
        self._write_marker(v_to)
        return {
            "from_version": v_from,
            "to_version": v_to,
            "dirs_read": len(added) + len(removed) + len(kept) + dv_dirs_read,
            "dirs_total": dirs_total,
            "dirty_groups": len(dirty),
        }
