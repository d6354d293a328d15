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
- JOINs are bilinear, not invertible-per-row; :class:`IncrementalJoinView`
  is their tier — Z-set state (distinct joined tuple + multiplicity) folded
  by the delta-join identity Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR, with each
  term's static side stat-pruned to the delta's key envelope.
  :class:`IncrementalLeftJoinView` extends it to LEFT OUTER with a
  three-part signed state (inner / left / right-key counts) and read-time
  null extension, so matched-status flips never generate retractions.

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

# Per-side watermark apps for the two-base join view: both reflected
# versions ride in ONE state commit (tables.py commit(txn=[...])) so a
# crash can never leave one side's watermark behind the state.
_MVJ_TXN_LEFT = "mvj_left"
_MVJ_TXN_RIGHT = "mvj_right"


def _signed_side_delta(
    base: VersionedTable,
    v_from: int | None,
    v_to: int,
    key_cols: Sequence[str],
) -> dict:
    """One base table's signed row delta between two snapshots, plus the
    metadata a delta-join prunes with.

    Returns ``{"rebuild", "delta", "dirs_read", "bounds"}``:

    - ``rebuild`` — no incremental rendering exists (first build, expired
      ``v_from`` snapshot, or deletion vectors DISAPPEARED via RESTORE /
      compaction); the other fields are then meaningless.
    - ``delta`` — DataFrame of base rows tagged ``__sign`` (+1 added /
      −1 removed, incl. merge-on-read DV pre-images), or None when empty.
    - ``dirs_read`` — dirs the delta scan actually opened.
    - ``bounds`` — ``{key: (lo, hi)}`` manifest-stat envelope of the
      touched dirs on ``key_cols``; a key any touched dir lacks stats for
      is omitted (the static side then reads unpruned on it — correct,
      just not cheap). Conservative by construction: dir stats bound every
      row in the dir, hence every delta row.
    """
    if v_from is None:
        return {"rebuild": True, "delta": None, "dirs_read": 0, "bounds": {}}
    try:
        old_m = base._manifest(v_from)
    except FileNotFoundError:
        return {"rebuild": True, "delta": None, "dirs_read": 0, "bounds": {}}
    m_to = base._manifest(v_to)
    if any(
        p not in set(m_to.get("delete_vectors", []))
        for p in old_m.get("delete_vectors", [])
    ):
        return {"rebuild": True, "delta": None, "dirs_read": 0, "bounds": {}}

    old_set, new_set = set(old_m["dirs"]), set(m_to["dirs"])
    added = [d for d in m_to["dirs"] if d not in old_set]
    removed = [d for d in old_m["dirs"] if d not in new_set]
    dv_delta, dv_ref = _dv_preimages(base, old_m, m_to, v_to)

    parts = []
    if added:
        parts.append(
            base._read_dirs(added, v_to).withColumn(
                "__sign", F.lit(1).cast("bigint")
            )
        )
    if removed:
        parts.append(
            base._read_dirs(removed, v_from).withColumn(
                "__sign", F.lit(-1).cast("bigint")
            )
        )
    if dv_delta is not None:
        parts.append(dv_delta.withColumn("__sign", F.lit(-1).cast("bigint")))
    if not parts:
        return {"rebuild": False, "delta": None, "dirs_read": 0, "bounds": {}}
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p)

    touched = [
        *((d, m_to) for d in added),
        *((d, old_m) for d in removed),
        *((d, m_to) for d in dv_ref),
    ]
    bounds: dict[str, tuple] = {}
    for k in key_cols:
        mms = [m.get("stats", {}).get(d, {}).get(k) for d, m in touched]
        if all(
            mm is not None and mm[0] is not None and mm[1] is not None
            for mm in mms
        ):
            bounds[k] = (min(mm[0] for mm in mms), max(mm[1] for mm in mms))
    return {
        "rebuild": False,
        "delta": delta,
        "dirs_read": len(added) + len(removed) + len(dv_ref),
        "bounds": bounds,
    }


def _dv_preimages(
    base: VersionedTable,
    old_m: dict,
    new_m: dict,
    v_to: int,
) -> tuple[DataFrame | None, list[str]]:
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

    Returns ``(pre_image_rows_or_None, dirs_read)`` — the dirs raw-read to
    recover the pre-images, so callers can both count refresh IO and look
    up those dirs' manifest key stats (the join view prunes its static-side
    read by the delta's key envelope).
    """
    dvs_from = old_m.get("delete_vectors", [])
    dvs_to = new_m.get("delete_vectors", [])
    new_dvs = [p for p in dvs_to if p not in set(dvs_from)]
    if not new_dvs:
        return None, []
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
        return None, []
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
    return hidden.select(*payload), ref


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
            dv_delta, dv_ref = _dv_preimages(self.base, old_m, m_to, v_to)
            dv_dirs_read = len(dv_ref)

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
    "subtracted" the way :class:`IncrementalAggView` folds COUNT/SUM —
    and exact COUNT(DISTINCT), where a delete may or may not remove the
    last copy of a value).

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
        distincts: Mapping[str, str] | None = None,
        max_dirty_collect: int = 100_000,
    ) -> None:
        self.spark = spark
        self.base = base
        self.key = key
        self.sums = dict(sums or {})
        self.mins = dict(mins or {})
        self.maxs = dict(maxs or {})
        self.distincts = dict(distincts or {})
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
        # Exact COUNT(DISTINCT): not group-invertible (a delete may or may
        # not remove the last copy of a value), which is exactly why it
        # lives in this recompute tier and not IncrementalAggView.
        for out, src in self.distincts.items():
            aggs.append(F.countDistinct(src).cast("bigint").alias(out))
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
        dv_delta, dv_ref = _dv_preimages(self.base, old_m, m_to, v_to)
        dv_dirs_read = len(dv_ref)
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


class IncrementalJoinView:
    """Incrementally-maintained INNER equi-join view over two
    :class:`VersionedTable` bases — the delta-join of DBSP / Materialize
    (and Delta Live Tables' join-backed materialized views, which the
    reference's gold layer recomputes from scratch per run,
    /root/reference/src/gold/load_to_gold.py).

    State is the join result as a Z-set: one row per DISTINCT joined tuple
    plus a BIGINT multiplicity ``n`` (bag semantics without storing
    duplicates). A refresh renders the bilinear delta identity

        Δ(L ⋈ R)  =  ΔL ⋈ R_new  ∪  L_old ⋈ ΔR

    — the ΔL⋈ΔR cross term lands exactly once because the first term joins
    against the NEW right and the second against the OLD left (which time
    travel provides for free). Each side's signed delta comes from the same
    manifest machinery as :class:`IncrementalAggView` (added dirs +1,
    removed dirs −1, merge-on-read DV pre-images −1), and signs multiply
    through the join, so copy-on-write and merge-on-read DML on EITHER base
    fold exactly; rows whose multiplicity reaches 0 leave the view.

    The static side of each term is NOT a full scan: its read is pruned by
    the manifest's per-dir min/max stats on the join keys, bounded by the
    delta dirs' own key envelope (driver-side metadata, no data read). For
    key-banded bases an appended band therefore joins against the matching
    band of the other table — refresh IO ∝ delta × join selectivity, never
    |L ⋈ R|. At 100 TB that is the difference between a view you refresh
    per commit and one you rebuild nightly.

    Both reflected base versions ride INSIDE each state commit as
    transactional watermarks (``txn=[("mvj_left", vl), ("mvj_right",
    vr)]``) — state and watermarks publish atomically, so a crash cannot
    re-fold one side's delta. Rebuild (expired snapshot, RESTORE past a
    MOR delete, first build) replaces state in ONE atomic commit.
    """

    def __init__(
        self,
        spark: SparkSession,
        left: VersionedTable,
        right: VersionedTable,
        on: Sequence[str],
        path: str,
        count_col: str = "n",
    ) -> None:
        self.spark = spark
        self.left = left
        self.right = right
        self.on = list(on)
        self.count_col = count_col
        self.result = VersionedTable(spark, path)
        self._marker_path = os.path.join(path, "_mvj_state.json")

    # -- watermarks ----------------------------------------------------------
    def refreshed_versions(self) -> tuple[int | None, int | None]:
        """(left, right) base versions the state reflects — from the txn
        watermarks inside the state commit, with the sidecar marker (written
        only for empty-delta refreshes, where there is no commit to carry
        the txns) folded in by max."""
        lv: list[int] = []
        rv: list[int] = []
        cur = self.result.current_version()
        if cur is not None:
            txns = self.result._manifest(cur).get("txns", {})
            if _MVJ_TXN_LEFT in txns:
                lv.append(int(txns[_MVJ_TXN_LEFT]))
            if _MVJ_TXN_RIGHT in txns:
                rv.append(int(txns[_MVJ_TXN_RIGHT]))
        if os.path.exists(self._marker_path):
            with open(self._marker_path) as fh:
                mk = json.load(fh)
            lv.append(int(mk["left_version"]))
            rv.append(int(mk["right_version"]))
        return (max(lv) if lv else None, max(rv) if rv else None)

    def _write_marker(self, v_l: int, v_r: int) -> None:
        tmp = self._marker_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"left_version": v_l, "right_version": v_r}, fh)
        os.replace(tmp, self._marker_path)

    # -- internals -----------------------------------------------------------
    def _out_cols(self) -> list[str]:
        lcols = [f.name for f in self.left.schema().fields]
        rcols = [f.name for f in self.right.schema().fields]
        overlap = (set(lcols) & set(rcols)) - set(self.on)
        if overlap:
            raise ValueError(
                f"non-key columns shared by both sides: {sorted(overlap)}; "
                "project them apart before the view"
            )
        missing = [k for k in self.on if k not in lcols or k not in rcols]
        if missing:
            raise ValueError(f"join keys absent from a side: {missing}")
        return (
            self.on
            + [c for c in lcols if c not in self.on]
            + [c for c in rcols if c not in self.on]
        )

    @staticmethod
    def _pruned_read(
        base: VersionedTable, version: int, bounds: Mapping[str, tuple]
    ) -> tuple[DataFrame, int]:
        """Static-side read at ``version``, opening only dirs whose key
        stats overlap ``bounds`` (dirs without stats always open — no false
        skips). Returns (frame, dirs_opened)."""
        m = base._manifest(version)
        if not m["dirs"]:
            return base.read(version=version), 0
        dirs = (
            VersionedTable._kept_dirs(m, dict(bounds)) if bounds else m["dirs"]
        )
        if not dirs:
            return base._read_dirs(m["dirs"], version).limit(0), 0
        return base._read_dirs(dirs, version), len(dirs)

    def _grouped(self, joined: DataFrame, out_cols: list[str]) -> DataFrame:
        return joined.groupBy(*out_cols).agg(
            F.sum("__sign").cast("bigint").alias(self.count_col)
        )

    # -- refresh ---------------------------------------------------------
    def refresh(self) -> dict:
        """Fold both bases' changes since the last refresh into the view.

        Returns {"from_versions", "to_versions", "dirs_read",
        "dirs_total"}; ``dirs_read`` counts delta dirs PLUS the pruned
        static-side dirs each term actually opened — the number tests pin
        the incremental contract on."""
        v_lt = self.left.current_version()
        v_rt = self.right.current_version()
        if v_lt is None or v_rt is None:
            raise ValueError("a base table has no snapshots")
        v_lf, v_rf = self.refreshed_versions()
        dirs_total = len(self.left._manifest(v_lt)["dirs"]) + len(
            self.right._manifest(v_rt)["dirs"]
        )
        out = {
            "from_versions": (v_lf, v_rf),
            "to_versions": (v_lt, v_rt),
            "dirs_total": dirs_total,
        }
        if v_lf == v_lt and v_rf == v_rt:
            return {**out, "dirs_read": 0}
        out_cols = self._out_cols()

        dl = _signed_side_delta(self.left, v_lf, v_lt, self.on)
        dr = _signed_side_delta(self.right, v_rf, v_rt, self.on)
        if (
            dl["rebuild"]
            or dr["rebuild"]
            or self.result.current_version() is None
        ):
            # One atomic replace — never a reset-then-fold pair.
            full = (
                self.left.read(version=v_lt)
                .join(self.right.read(version=v_rt), on=self.on)
                .withColumn("__sign", F.lit(1).cast("bigint"))
            )
            self.result.commit(
                self._grouped(full, out_cols),
                mode="overwrite",
                _operation="mvj_build",
                txn=[(_MVJ_TXN_LEFT, v_lt), (_MVJ_TXN_RIGHT, v_rt)],
            )
            self._write_marker(v_lt, v_rt)
            return {**out, "dirs_read": dirs_total}

        parts = []
        dirs_read = dl["dirs_read"] + dr["dirs_read"]
        if dl["delta"] is not None:
            r_new, opened = self._pruned_read(self.right, v_rt, dl["bounds"])
            dirs_read += opened
            parts.append(dl["delta"].join(r_new, on=self.on))
        if dr["delta"] is not None:
            l_old, opened = self._pruned_read(self.left, v_lf, dr["bounds"])
            dirs_read += opened
            parts.append(l_old.join(dr["delta"], on=self.on))
        if not parts:
            self._write_marker(v_lt, v_rt)
            return {**out, "dirs_read": 0}
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        partial = self._grouped(delta, out_cols)
        # Merge by union + re-group (not full_outer join): groupBy equates
        # NULL payload values, so a NULL-bearing tuple cannot split into
        # two state rows the way a non-null-safe join merge would.
        merged = (
            self.result.read()
            .select(*out_cols, self.count_col)
            .unionByName(partial)
            .groupBy(*out_cols)
            .agg(F.sum(self.count_col).cast("bigint").alias(self.count_col))
            .filter(F.col(self.count_col) > 0)
        )
        self.result.commit(
            merged,
            mode="overwrite",
            _operation="mvj_refresh",
            txn=[(_MVJ_TXN_LEFT, v_lt), (_MVJ_TXN_RIGHT, v_rt)],
        )
        self._write_marker(v_lt, v_rt)
        return {**out, "dirs_read": dirs_read}

    def read(self) -> DataFrame:
        """Current state: joined tuples + multiplicity ``n``."""
        return self.result.read()

    def read_rows(self) -> DataFrame:
        """State re-expanded to bag semantics (each tuple repeated ``n``
        times) for consumers that want plain join-result rows."""
        state = self.result.read()
        cols = [c for c in state.columns if c != self.count_col]
        return state.withColumn(
            "__i", F.explode(F.sequence(F.lit(1), F.col(self.count_col)))
        ).select(*cols)


class IncrementalLeftJoinView(IncrementalJoinView):
    """LEFT OUTER delta-join view — the case naive Z-set joins get wrong,
    because a right-side insert must RETRACT a previously-emitted
    null-extended row (and a delete of a key's last right row must emit
    one). Rather than generating retractions, the state splits into three
    signed parts folded in ONE atomic commit (a ``__part`` discriminator
    column keeps them in a single table so a crash can't split them):

    - ``inner``  — the inner join as a Z-set, maintained by the parent's
      bilinear delta identity;
    - ``left``   — the left relation as a Z-set (cheap per-side fold, no
      join);
    - ``rcount`` — per-join-key right-row multiplicities (a keyed signed
      sum, no join).

    ``read()`` derives the outer result ON READ: inner rows, plus left
    rows whose key is absent from the live ``rcount`` keys, null-extended.
    Matched-status flips are therefore never materialized as retractions —
    they fall out of the anti-join — which is what keeps every refresh a
    pure signed fold. Refresh IO is the parent's delta-join cost plus two
    delta-sized folds."""

    _PART = "__part"

    def _full_schema_cols(self, out_cols: list[str]) -> list[str]:
        return [*out_cols, self.count_col, self._PART]

    def _left_cols(self) -> list[str]:
        return [f.name for f in self.left.schema().fields]

    def _as_part(
        self, df: DataFrame, out_cols: list[str], part: str
    ) -> DataFrame:
        """Project a partial (missing columns NULL-filled) into the unified
        state schema, typed off the joined frame's column set."""
        sel = []
        for c in out_cols:
            sel.append(F.col(c) if c in df.columns else F.lit(None).alias(c))
        return df.select(
            *sel, F.col(self.count_col), F.lit(part).alias(self._PART)
        )

    def refresh(self) -> dict:
        v_lt = self.left.current_version()
        v_rt = self.right.current_version()
        if v_lt is None or v_rt is None:
            raise ValueError("a base table has no snapshots")
        v_lf, v_rf = self.refreshed_versions()
        dirs_total = len(self.left._manifest(v_lt)["dirs"]) + len(
            self.right._manifest(v_rt)["dirs"]
        )
        out = {
            "from_versions": (v_lf, v_rf),
            "to_versions": (v_lt, v_rt),
            "dirs_total": dirs_total,
        }
        if v_lf == v_lt and v_rf == v_rt:
            return {**out, "dirs_read": 0}
        out_cols = self._out_cols()

        dl = _signed_side_delta(self.left, v_lf, v_lt, self.on)
        dr = _signed_side_delta(self.right, v_rf, v_rt, self.on)
        if (
            dl["rebuild"]
            or dr["rebuild"]
            or self.result.current_version() is None
        ):
            lt = self.left.read(version=v_lt).withColumn(
                "__sign", F.lit(1).cast("bigint")
            )
            rt = self.right.read(version=v_rt).withColumn(
                "__sign", F.lit(1).cast("bigint")
            )
            inner = self._grouped(lt.drop("__sign").join(rt, on=self.on), out_cols)
            left = lt.groupBy(*self._left_cols()).agg(
                F.sum("__sign").cast("bigint").alias(self.count_col)
            )
            rcount = rt.groupBy(*self.on).agg(
                F.sum("__sign").cast("bigint").alias(self.count_col)
            )
            state = (
                self._as_part(inner, out_cols, "inner")
                .unionByName(self._as_part(left, out_cols, "left"))
                .unionByName(self._as_part(rcount, out_cols, "rcount"))
            )
            self.result.commit(
                state,
                mode="overwrite",
                _operation="mvj_build",
                txn=[(_MVJ_TXN_LEFT, v_lt), (_MVJ_TXN_RIGHT, v_rt)],
            )
            self._write_marker(v_lt, v_rt)
            return {**out, "dirs_read": dirs_total}

        parts = []
        dirs_read = dl["dirs_read"] + dr["dirs_read"]
        if dl["delta"] is not None:
            r_new, opened = self._pruned_read(self.right, v_rt, dl["bounds"])
            dirs_read += opened
            parts.append(
                self._as_part(
                    self._grouped(dl["delta"].join(r_new, on=self.on), out_cols),
                    out_cols,
                    "inner",
                )
            )
            parts.append(
                self._as_part(
                    dl["delta"]
                    .groupBy(*self._left_cols())
                    .agg(F.sum("__sign").cast("bigint").alias(self.count_col)),
                    out_cols,
                    "left",
                )
            )
        if dr["delta"] is not None:
            l_old, opened = self._pruned_read(self.left, v_lf, dr["bounds"])
            dirs_read += opened
            parts.append(
                self._as_part(
                    self._grouped(l_old.join(dr["delta"], on=self.on), out_cols),
                    out_cols,
                    "inner",
                )
            )
            parts.append(
                self._as_part(
                    dr["delta"]
                    .groupBy(*self.on)
                    .agg(F.sum("__sign").cast("bigint").alias(self.count_col)),
                    out_cols,
                    "rcount",
                )
            )
        if not parts:
            self._write_marker(v_lt, v_rt)
            return {**out, "dirs_read": 0}
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        merged = (
            self.result.read()
            .select(*self._full_schema_cols(out_cols))
            .unionByName(delta)
            .groupBy(*out_cols, self._PART)
            .agg(F.sum(self.count_col).cast("bigint").alias(self.count_col))
            .filter(F.col(self.count_col) != 0)
            .select(*self._full_schema_cols(out_cols))
        )
        self.result.commit(
            merged,
            mode="overwrite",
            _operation="mvj_refresh",
            txn=[(_MVJ_TXN_LEFT, v_lt), (_MVJ_TXN_RIGHT, v_rt)],
        )
        self._write_marker(v_lt, v_rt)
        return {**out, "dirs_read": dirs_read}

    def read(self) -> DataFrame:
        """The LEFT OUTER join result as (tuple, multiplicity): inner part
        rows plus null-extended left rows whose key has no live right row."""
        out_cols = self._out_cols()
        s = self.result.read()
        inner = s.filter(F.col(self._PART) == "inner").select(
            *out_cols, self.count_col
        )
        left = s.filter(F.col(self._PART) == "left")
        rkeys = s.filter(
            (F.col(self._PART) == "rcount") & (F.col(self.count_col) > 0)
        ).select(*self.on)
        unmatched = left.join(rkeys, on=self.on, how="left_anti").select(
            *out_cols, self.count_col
        )
        return inner.unionByName(unmatched)
