"""Streamed-index shard compaction (VERDICT r7 ask #5): folding the
accumulated ``batch=<id>`` shards must leave every probe answer
bit-identical while shrinking the directory count — listing cost is the
thing being optimized, so the tests assert both.

Shards are landed through the same writes the streaming ingests perform
(per-batch partial → ``batch=<id>`` subdir), without spinning up the
micro-batch engine: the compactors operate on the on-disk layout, and the
ingest-equivalence tests in test_operators cover the writers themselves.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.streaming.compaction import (
    _list_batches,
    compact_ann_cells,
    compact_cms_sketch,
    compact_histogram_sketch,
    compact_kmv_sketch,
    compact_weighted_sample,
)

from .conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, (tuple(str(x) for x in r) for r in df.collect())))


def _land_ann_batches(spark, cells_dir: str, n_batches: int = 4):
    from pyspark.sql import Window

    from lakeflow.functions.rounding import rnd
    from lakeflow.functions.vectors import dot, norm

    raw = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = raw.filter(F.col("vec_id") < 16)
    cent = cents.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv_c"),
        norm("embedding").alias("cn_c"),
    )
    for bid in range(n_batches):
        b = raw.filter(F.col("vec_id") % n_batches == bid).select(
            F.col("vec_id").alias("vid"), "embedding",
            norm("embedding").alias("vn"),
        )
        s = b.join(F.broadcast(cent)).select(
            "vid", "embedding", "vn", "cid",
            rnd(dot("embedding", "cv_c") / (F.col("vn") * F.col("cn_c")), 6)
            .alias("ccos"),
        )
        w = Window.partitionBy("vid").orderBy(F.desc("ccos"), F.asc("cid"))
        (
            s.withColumn("crn", F.row_number().over(w))
            .filter(F.col("crn") == 1)
            .select("cid", "vid", "embedding", "vn")
            .write.partitionBy("cid")
            .mode("overwrite")
            .parquet(f"{cells_dir}/batch={bid}")
        )
    return raw, cents


def test_compact_ann_cells_probe_identical(spark, tmp_path):
    from lakeflow.operators.similarity import ivf_probe_cells

    cells = str(tmp_path / "cells")
    raw, cents = _land_ann_batches(spark, cells, n_batches=4)
    q = raw.filter(F.col("vec_id") < 10)

    before = _rows(ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4))
    folded = compact_ann_cells(spark, cells)
    assert folded == 2  # batches 0-2 fold into one; batch 3 kept for replay
    assert _list_batches(cells) == [2, 3]
    after = _rows(ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4))
    assert after == before
    # One file set per cell in the folded shard, not one per (batch, cell).
    assert all(d.startswith(("cid=", "_", "."))
               for d in os.listdir(f"{cells}/batch=2"))
    # Idempotent: nothing left to fold below the replay tail.
    assert compact_ann_cells(spark, cells) == 0


def test_compact_ann_keep_last_zero_folds_everything(spark, tmp_path):
    """keep_last=0 is the quiesced-stream form (no replay possible):
    every shard folds into one."""
    from lakeflow.operators.similarity import ivf_probe_cells

    cells = str(tmp_path / "cells")
    raw, cents = _land_ann_batches(spark, cells, n_batches=3)
    q = raw.filter(F.col("vec_id") < 10)
    before = _rows(ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4))
    assert compact_ann_cells(spark, cells, keep_last=0) == 2
    assert _list_batches(cells) == [2]
    assert _rows(
        ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4)
    ) == before


def test_keep_last_exceeding_batch_count_folds_nothing(spark, tmp_path):
    """keep_last > #batches must protect ALL shards (ADVICE r8: a negative
    slice bound used to fold from the FRONT, folding exactly the shards the
    caller asked to keep and inviting replay double-counts)."""
    cells = str(tmp_path / "cells")
    _land_ann_batches(spark, cells, n_batches=3)
    assert compact_ann_cells(spark, cells, keep_last=5) == 0
    assert _list_batches(cells) == [0, 1, 2]
    # Boundary: keep_last == #batches also protects everything.
    assert compact_ann_cells(spark, cells, keep_last=3) == 0
    assert _list_batches(cells) == [0, 1, 2]


def test_compact_cms_and_histogram_sum_partials(spark, tmp_path):
    from lakeflow.operators.aggregates import (
        cms_cells,
        histogram_partials,
        read_cms_cells,
        read_histogram_bins,
    )

    orders = load_table(spark, SF_DIR, "orders")
    cms_dir, hist_dir = str(tmp_path / "cms"), str(tmp_path / "hist")
    for bid in range(4):
        b = orders.filter(F.col("o_orderkey") % 4 == bid)
        cms_cells(b, "o_custkey").coalesce(1).write.mode("overwrite").parquet(
            f"{cms_dir}/cells/batch={bid}"
        )
        histogram_partials(b, "o_totalprice", width=10000.0).coalesce(1) \
            .write.mode("overwrite").parquet(f"{hist_dir}/bins/batch={bid}")

    cms_before = _rows(read_cms_cells(spark, cms_dir))
    hist_before = _rows(read_histogram_bins(spark, hist_dir))
    assert compact_cms_sketch(spark, cms_dir) == 2
    assert compact_histogram_sketch(spark, hist_dir) == 2
    assert _list_batches(f"{cms_dir}/cells") == [2, 3]
    assert _rows(read_cms_cells(spark, cms_dir)) == cms_before
    assert _rows(read_histogram_bins(spark, hist_dir)) == hist_before


def test_compact_kmv_and_weighted_sample(spark, tmp_path):
    from lakeflow.operators.aggregates import kmv_minima, merge_kmv_minima
    from lakeflow.operators.transforms import weighted_hash_sample

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    kmv_dir, samp_dir = str(tmp_path / "kmv"), str(tmp_path / "samp")
    for bid in range(4):
        b = docs.filter(F.col("doc_id") % 4 == bid)
        kmv_minima(b, "doc_id", 64, group_cols=["lang"]).coalesce(1) \
            .write.mode("overwrite").parquet(f"{kmv_dir}/minima/batch={bid}")
        weighted_hash_sample(b, "doc_id", "n_chars", 50).coalesce(1) \
            .write.mode("overwrite").parquet(f"{samp_dir}/cand/batch={bid}")

    kmv_before = _rows(
        merge_kmv_minima(
            spark.read.parquet(f"{kmv_dir}/minima"), 64, group_cols=["lang"]
        )
    )
    samp_before = _rows(
        weighted_hash_sample(
            spark.read.parquet(f"{samp_dir}/cand"), "doc_id", "n_chars", 50
        ).select("doc_id", "lang", "n_chars")
    )
    assert compact_kmv_sketch(spark, kmv_dir, 64, group_cols=["lang"]) == 2
    assert compact_weighted_sample(
        spark, samp_dir, "doc_id", "n_chars", 50
    ) == 2
    assert _rows(
        merge_kmv_minima(
            spark.read.parquet(f"{kmv_dir}/minima"), 64, group_cols=["lang"]
        )
    ) == kmv_before
    assert _rows(
        weighted_hash_sample(
            spark.read.parquet(f"{samp_dir}/cand"), "doc_id", "n_chars", 50
        ).select("doc_id", "lang", "n_chars")
    ) == samp_before


def test_nothing_to_fold_is_a_noop(spark, tmp_path):
    cells = str(tmp_path / "cells")
    _land_ann_batches(spark, cells, n_batches=2)
    # Two shards, keep_last=1 → fold set is a single shard: no-op.
    assert compact_ann_cells(spark, cells) == 0
    assert _list_batches(cells) == [0, 1]
    # Missing directory: no-op, not an error.
    assert compact_cms_sketch(spark, str(tmp_path / "absent")) == 0


def test_crashed_swap_before_rename_rolls_back(spark, tmp_path):
    """Crash after the originals moved aside but before the fold renamed
    in: the next run must restore the originals (no under-count persists)
    and then compact normally — probe answers unchanged throughout."""
    import shutil

    from lakeflow.operators.similarity import ivf_probe_cells

    cells = str(tmp_path / "cells")
    raw, cents = _land_ann_batches(spark, cells, n_batches=4)
    q = raw.filter(F.col("vec_id") < 10)
    before = _rows(ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4))

    # Simulate the crash state: fold written to tmp, marker down, two of
    # the three folded shards moved aside, rename never happened.
    os.makedirs(f"{cells}/_compact.tmp")
    open(f"{cells}/_compact.plan", "w").close()
    os.makedirs(f"{cells}/_compact.trash")
    for b in (0, 1):
        os.rename(f"{cells}/batch={b}", f"{cells}/_compact.trash/batch={b}")
    assert _list_batches(cells) == [2, 3]  # the under-count window

    assert compact_ann_cells(spark, cells) == 2  # recovery + real fold
    assert _list_batches(cells) == [2, 3]
    assert _rows(
        ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4)
    ) == before
    assert not os.path.exists(f"{cells}/_compact.plan")
    assert not os.path.exists(f"{cells}/_compact.trash")
    shutil.rmtree(cells)


def test_crashed_swap_after_rename_rolls_forward(spark, tmp_path):
    """Crash after the fold renamed in but before the trash deleted: the
    trashed originals are superseded — the next run must NOT restore them
    (that would double-count) and the probe answers stay correct."""
    from lakeflow.operators.similarity import ivf_probe_cells
    from lakeflow.streaming.compaction import _fold_batch_shards

    cells = str(tmp_path / "cells")
    raw, cents = _land_ann_batches(spark, cells, n_batches=4)
    q = raw.filter(F.col("vec_id") < 10)
    before = _rows(ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4))

    # Run a REAL fold, then recreate the post-rename crash state: marker
    # back down, superseded originals back in a trash dir.
    assert compact_ann_cells(spark, cells) == 2
    open(f"{cells}/_compact.plan", "w").close()
    os.makedirs(f"{cells}/_compact.trash/batch=0")
    open(f"{cells}/_compact.trash/batch=0/stale.parquet", "w").close()

    # Any fold (here: a no-op, nothing left to fold) recovers first.
    assert compact_ann_cells(spark, cells) == 0
    assert not os.path.exists(f"{cells}/_compact.plan")
    assert not os.path.exists(f"{cells}/_compact.trash")
    assert _list_batches(cells) == [2, 3]
    assert _rows(
        ivf_probe_cells(spark, cells, q, cents, k=5, n_probe=4)
    ) == before


def test_compact_text_index_preserves_positions_and_recovers(spark, tmp_path):
    """A POSITIONAL index must keep its positions column through
    compaction (phrase search survives — the rewrite previously projected
    it away), and the text-index swap shares the marker-based crash
    recovery: a crash after the live parts moved aside rolls back to the
    pre-compaction index on the next run."""
    import shutil

    from lakeflow.operators.text import (
        append_to_text_index,
        build_text_index,
        compact_text_index,
        phrase_match,
    )

    docs = spark.createDataFrame(
        [(1, "batch batch stream"), (2, "table scan plan table scan"),
         (3, "stream table scan")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_text_index(docs.filter("doc_id <= 2"), idx, include_positions=True)
    append_to_text_index(
        docs.filter("doc_id = 3"), idx, include_positions=True
    )
    before = sorted(
        map(tuple, phrase_match(spark, idx, ["table", "scan"]).collect())
    )
    assert before  # phrase hits exist pre-compaction

    compact_text_index(spark, idx)
    assert "positions" in spark.read.parquet(f"{idx}/postings").columns
    assert sorted(
        map(tuple, phrase_match(spark, idx, ["table", "scan"]).collect())
    ) == before

    # Crash state: fold in tmp, marker down, live parts moved aside.
    os.makedirs(f"{idx}/_compact/postings")
    open(f"{idx}/_compact.plan", "w").close()
    os.makedirs(f"{idx}/_compact.trash")
    for part in ("postings", "corpus_stats"):
        os.rename(f"{idx}/{part}", f"{idx}/_compact.trash/{part}")
    compact_text_index(spark, idx)  # recovers, then compacts again
    assert sorted(
        map(tuple, phrase_match(spark, idx, ["table", "scan"]).collect())
    ) == before
    assert not os.path.exists(f"{idx}/_compact.plan")
    assert not os.path.exists(f"{idx}/_compact.trash")
    shutil.rmtree(idx)
