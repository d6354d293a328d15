"""Deduplication operators for LLM-data pipelines (north star; BASELINE.json).

Beyond the reference's keyed ranked dedup (W1, lakeflow.operators.transforms
.dedup_latest), a training-data pipeline needs *content* dedup:

* exact       — hash-groupBy on a normalized fingerprint; one shuffle on the
                hash, map-side partial min. The 100 TB workhorse.
* MinHash-LSH — shingle → per-seed min-hash signature → band buckets →
                candidate pairs only where a band collides. Join cost scales
                with collisions, not |docs|².
* SimHash     — token-weight sign vector → compact bit signature; near-dup =
                small Hamming distance.
* n-gram Jaccard — exact pairwise similarity, for candidate verification.

Determinism: hashing that the ORACLE must replay value-for-value goes
through md5 (identical everywhere) rather than engine-private hash
functions — min over fixed-width lowercase hex strings == min over the
underlying 128-bit int. Where a hash is only an internal GROUPING key that
never reaches the output (exact_substring_dedup's window fingerprint), a
16-byte seeded-xxhash64 pair replaces the 32-char md5 hex: same grouping,
half the shuffle-key bytes, no joined-string materialization — the oracle
keeps md5 and still matches because only group identity matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeflow.operators.transforms import fan_out

from lakeflow.functions.rounding import rnd


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def template_fingerprint(col: Column | str) -> Column:
    """TEMPLATE fingerprint: like `fingerprint`, but digit runs collapse to a
    single '0' first — so machine-generated boilerplate that differs only in
    numbers (ids, dates, prices, counters) lands on one fingerprint. This is
    the cheap scan-side pass that catches the single biggest near-dup family
    in web corpora BEFORE the (much costlier) MinHash/SimHash machinery runs;
    everything stays a Catalyst projection, zero Python, and the regexes are
    RE2-safe so any engine replays them. Whitespace is collapsed with an
    explicit ASCII class (not \\s) to keep Java-regex and RE2 semantics
    identical on unicode inputs."""
    c = F.col(col) if isinstance(col, str) else col
    digits_folded = F.regexp_replace(c, "[0-9]+", "0")
    return F.md5(
        F.lower(F.trim(F.regexp_replace(digits_folded, "[ \\t\\r\\n]+", " ")))
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id doc per identical normalized text.

    Output: fp, keep_id (surviving doc), n_dups (group size).
    """
    return (
        fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct n-word shingles per doc: (id, shingle).

    PRECONDITION (ADVICE r13): one input row per ``id_col`` value. Dedup is
    per-ROW (``array_distinct`` inside the row, replacing the former
    corpus-wide ``(id, token)`` distinct); an id split across several input
    rows would keep per-row duplicates, changing downstream signature
    multiplicities. All registered callers feed one-row-per-doc tables.

    Built-ins only: split → transform(sequence) → array_distinct → explode.
    The token array is materialized as a column FIRST — referencing the split
    expression inside the transform lambda would re-run the regex+split per
    shingle index (O(tokens²) regex work per doc). Everything is scan-side
    and narrow: no shuffle at all.
    """
    toked = fan_out(
        df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(text_col), " ").alias("__toks"),
        ),
        barrier=True,  # materialize the split; see fan_out docstring
    )
    toks = F.col("__toks")
    idxs = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    # slice is 1-based; join n consecutive tokens.
    sh = F.transform(idxs, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    # Dedup INSIDE the row (array_distinct), not with .distinct(): the id is
    # part of the output key, so duplicates are only ever intra-doc — a
    # corpus-wide (id, shingle) exchange bought nothing (r13 guide §2.4).
    # Scan-side dedup also re-enables map-side partial aggregation for every
    # downstream groupBy("id") consumer (minhash_signatures ships 16 partial
    # mins per doc per map task instead of the whole shingle set).
    return toked.select("id", F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of the md5 hex
    digest cyclically rotated by 2·i characters. Output: (id, sigs
    array<string> ordered by i).

    One md5 per shingle (not per shingle×hash): each rotation is a bijection
    on 32-char hex strings, so "min under rotation i" is a minhash for an
    independent-enough permutation of the shingle space at 1/num_hashes the
    hash cost — the dominant CPU of the whole pipeline. Single aggregation
    with ``num_hashes`` min() columns: one shuffle keyed on id, map-side
    partial mins, no row blowup.

    ``num_hashes`` is capped at 16: rotation by 2·i characters of a 32-char
    digest yields distinct permutations only for i in [0, 16); beyond that
    the substring arithmetic would silently produce malformed signatures.
    """
    if not 1 <= num_hashes <= 16:
        raise ValueError(
            f"num_hashes must be in [1, 16] (rotation permutations of a "
            f"32-char md5 digest), got {num_hashes}"
        )
    hashed = shingles.withColumn("__hx", F.md5(F.col("shingle")))

    def rot(i: int) -> F.Column:
        if i == 0:
            return F.col("__hx")
        k = 2 * i
        return F.concat(
            F.substring("__hx", k + 1, 32 - k), F.substring("__hx", 1, k)
        )

    mins = hashed.groupBy("id").agg(
        *[F.min(rot(i)).alias(f"__mh{i}") for i in range(num_hashes)]
    )
    return mins.select(
        "id", F.array(*[f"__mh{i}" for i in range(num_hashes)]).alias("sigs")
    )


def band_buckets(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH band bucket keys of each signature: (id, band, bh) — one row per
    (doc, band), bh = md5 of that band's signature slice. The shared
    primitive under pairwise candidate generation AND the incremental
    ingest index (:func:`incremental_fuzzy_dedup`)."""
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    return signatures.select("id", "sigs", band_idx).select(
        "id",
        "band",
        F.md5(
            F.array_join(
                F.slice("sigs", F.col("band") * rows_per_band + 1, rows_per_band),
                "|",
            )
        ).alias("bh"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band bucket.

    Output: (id_a, id_b) with id_a < id_b, distinct. The self-join keys on
    (band_idx, band_hash) — cost proportional to real collisions.

    ``max_bucket`` is the degenerate-bucket guard for huge corpora: a bucket
    with B members emits O(B²) pairs, and boilerplate-heavy content (empty
    docs, license headers) produces buckets with millions of members. When
    set, buckets larger than ``max_bucket`` are split by a secondary md5 salt
    so per-bucket pair counts stay O(max_bucket²)·splits. Cross-salt pairs
    inside a degenerate bucket are forgone deliberately — content that
    degenerate belongs to exact dedup (identical fingerprints), which runs
    before LSH in the pipeline.
    """
    banded = band_buckets(signatures, bands=bands, rows_per_band=rows_per_band)
    if max_bucket is not None:
        # Sizes via groupBy + broadcast join-back, NOT a window count over
        # (band, bh): measured r13 — the window forces a full exchange +
        # sort of the banded rows and converged 0.4 s SLOWER at sf0.1
        # (2.34 vs 1.92 warm) than recomputing the (scan-side-cheap)
        # pipeline for the tiny sizes aggregate that AQE broadcasts.
        sizes = banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("__n"))
        n_salts = F.greatest(F.ceil(F.col("__n") / max_bucket), F.lit(1))
        banded = (
            banded.join(sizes, on=["band", "bh"])
            .withColumn(
                "salt",
                F.pmod(
                    F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                    .cast("long"),
                    n_salts,
                ),
            )
            .drop("__n")
        )
    else:
        banded = banded.withColumn("salt", F.lit(0))
    # Materialize once: the self-join would otherwise recompute the whole
    # shingle→signature pipeline for BOTH sides (2× the dominant cost). At
    # warehouse scale this is "write signatures to a table, join the table".
    banded = banded.persist()
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Materialize the (small) candidate set eagerly, then release the banded
    # cache — otherwise repeated calls accumulate cached signature blocks for
    # the session lifetime. localCheckpoint blocks are freed by the context
    # cleaner when the returned frame is garbage-collected.
    pairs = pairs.localCheckpoint(eager=True)
    banded.unpersist()
    return pairs


def jaccard_pairs(
    shingles: DataFrame, min_sim: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard over docs sharing ≥1 shingle.

    Output: (id_a, id_b, jaccard) rounded to 6. The shingle self-join is the
    scale hazard — feed it LSH candidates (semi-join on lsh_candidate_pairs)
    instead of raw shingles when |docs| is large.
    """
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            rnd(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    if min_sim > 0:
        out = out.filter(F.col("jaccard") >= min_sim)
    return out


def jaccard_verify(
    shingles: DataFrame,
    candidates: DataFrame,
    min_sim: float = 0.0,
    eager: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for a given candidate pair list — the verification
    stage of the LSH pipeline (candidates from :func:`lsh_candidate_pairs`).

    Per-pair intersection: candidates (small) broadcast-join the shingle
    relation on each side, shared shingles are counted per pair. Cost is
    O(|candidates| · shingles_per_doc) — the raw shingle self-join in
    :func:`jaccard_pairs` never runs. Pairs with zero shared shingles drop
    out (their Jaccard is 0, below any positive ``min_sim``).

    The shingle relation is first SEMI-FILTERED to candidate doc ids and
    persisted: every downstream consumer (sizes, both join sides) is
    candidate-scoped, so without the filter the (id_b, shingle) join and
    the sizes groupBy each shuffle the CORPUS-wide shingle set — and
    recompute the shingle expression — to use the tiny candidate slice of
    it. The id list rides a left-semi join (AQE broadcasts it while small,
    falls back to shuffle when a pathological candidate set is huge), and
    the persisted working set is O(candidate docs · shingles_per_doc) —
    the size the verification stage touches by definition.

    Cache lifetime (ADVICE r11): returned lazily, that working set's cache
    entry is CALLER-owned — it lives until ``spark.catalog.clearCache()``
    (the bench harness clears between passes) or session end. Long-lived
    sessions calling this repeatedly should pass ``eager=True`` to
    materialize the (candidate-bounded) pair output via ``localCheckpoint``
    and unpersist the working set before return.
    """
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh_c = shingles.join(cand_ids, "id", "leftsemi").persist()
    sizes = sh_c.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh_c.withColumnsRenamed({"id": "id_a"})
    b = sh_c.withColumnsRenamed({"id": "id_b"})
    # Plain equi-joins: AQE broadcasts the candidate list while it is small
    # and falls back to shuffle when a huge corpus yields many candidates —
    # forcing broadcast here would OOM exactly at the scale that matters.
    inter = (
        a.join(candidates, "id_a")
        .join(b, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            rnd(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    if min_sim > 0:
        out = out.filter(F.col("jaccard") >= min_sim)
    if eager:
        out = out.localCheckpoint(eager=True)
        sh_c.unpersist()
    return out


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash from token md5s: bit j = sign of Σ_tokens (±1 by the
    low bit of hex digit j of md5(token)). Output: (id, simhash int).

    Narrow explode + one hash-agg; signature comparison is then O(1)/pair.
    PRECONDITION: one input row per ``id_col`` (see :func:`word_shingles` —
    token dedup is per-row since r13, so a multi-row id would change the
    bit sums).
    """
    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        # array_distinct inside the row replaces a corpus-wide (id, tok)
        # .distinct() exchange — duplicates are intra-doc only (guide §2.4).
        F.explode(F.array_distinct(F.split(normalize_text(text_col), " "))).alias(
            "tok"
        ),
    )
    # One hex→int conversion per token; bit j tests are then integer ANDs —
    # 16 string ops per token collapse into one.
    h = toks.withColumn(
        "hb", F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int")
    )
    weights = h.select(
        "id",
        *[
            F.when(F.col("hb").bitwiseAND(F.lit(1 << j)) != 0, 1)
            .otherwise(-1)
            .alias(f"w{j}")
            for j in range(16)
        ],
    )
    sums = weights.groupBy("id").agg(
        *[F.sum(f"w{j}").alias(f"s{j}") for j in range(16)]
    )
    sig = F.lit(0)
    for j in range(16):
        sig = sig + F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sums.select("id", sig.cast("int").alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, cache: bool = True
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming, via pigeonhole blocking.

    The 16-bit signature splits into 4 nibble blocks; ``max_hamming <= 3``
    differing bits cannot touch all 4 blocks, so every qualifying pair shares
    at least one (block_idx, nibble) key — the equi-join on that key replaces
    the O(n²) cross comparison. Candidate pairs that collide in several blocks
    are deduped before the exact Hamming filter, which keeps results identical
    to the naive self-join. At 100 TB the bucket key is a partition key and
    each bucket compares locally.

    ``cache`` persists the keyed signature frame (4 small rows per doc)
    so the self-join's two sides share ONE run of the upstream signature
    pipeline (the token explode + md5 + 16-column aggregate that dominates
    when ``sigs`` is ``simhash16(...)``) — per-partition cache locking
    makes whichever side materializes first feed the other. Unlike
    lsh_candidate_pairs the PAIR set is not eagerly checkpointed: a
    saturated 16-bit signature space emits millions of pairs (3.8M at
    sf0.1), and materializing them twice — once into checkpoint blocks,
    once for the consumer — costs more than the cache it would release.
    """
    n_blocks = 4
    if max_hamming >= n_blocks:
        raise ValueError("pigeonhole blocking needs max_hamming < n_blocks")
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), 4 * i).bitwiseAND(F.lit(0xF)).alias(
                    "nib"
                ),
            )
            for i in range(n_blocks)
        ]
    )
    keyed = sigs.select("id", "simhash", F.explode(blocks).alias("b")).select(
        "id", "simhash", F.col("b.blk").alias("blk"), F.col("b.nib").alias("nib")
    )
    if cache:
        keyed = keyed.persist()
    a = keyed.alias("a")
    b = keyed.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")).cast("int")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


# Driver-side connected-components tier: edge lists at or under this many
# rows (32 MB of Arrow at 2M) are solved as numpy arrays on the driver;
# tests monkeypatch it to 0 to force the distributed loop.
_DRIVER_CC_MAX_EDGES = 2_000_000


def dup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs: assign every doc in a
    dup cluster the cluster's minimum id (the canonical survivor).

    Min-label propagation WITH pointer doubling (hash-to-min): each round
    every node adopts the smallest label among itself and its neighbors,
    then jumps to ITS LABEL'S label — so label information travels 2^round
    hops, and convergence is O(log diameter) rounds, not O(diameter).
    Near-clique dup clusters converge in 2-3 rounds either way; the
    doubling is what keeps CHAIN-shaped components (entity-resolution
    graphs, digit-ladder name matches) from needing a round per hop — the
    plain form burned 20 rounds (~22 s) on a 3k-node name-chain graph
    where this converges in 5 (~3 s). Labels are always member ids of the
    same component and only decrease, so the fixpoint (= component min) is
    unchanged. Each round is two shuffle joins on the pair list, which is
    O(near-dups) — never O(corpus). The driver-side loop holds only the
    convergence flag, not data.

    Input: (id_a, id_b) pairs. Output: (id, cluster_id) for every id appearing
    in any pair, cluster_id = min id of its component.

    Size-adaptive rounds: the component graph is usually orders smaller
    than the corpus it came from (edges ∝ true near-dups), so when the
    edge list is broadcast-sized each round's three joins run broadcast —
    zero shuffles, one stage, ~10× less per-round scheduling overhead than
    32-way shuffles of a few thousand rows. Past the threshold the loop
    falls back to shuffle joins — the same measured-size-over-static-conf
    call `stats_planned_join` makes.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    n_edges = edges.count()  # materializes the persist; sizes the strategy

    # Driver-side tier (r10): below the BROADCAST threshold the edge list
    # is, by definition, small enough to ship to every executor — so the
    # driver can hold it outright, and a vectorized numpy hash-to-min
    # (same algorithm, same fixpoint) replaces ~5 rounds × 3 Spark joins
    # of scheduling with one Arrow transfer + microseconds of array ops.
    # 2M edges = 32 MB over Arrow, ~20 ms per np.minimum.at round. This is
    # the same measured-size-over-static-conf call stats_planned_join
    # makes, one tier further down; bigger graphs keep the distributed
    # loop below, so the operator never stops scaling. Integral-id guard:
    # the array path indexes labels by position, so non-integer ids (and
    # non-bigint, to keep the output schema byte-identical) fall through.
    # Null-id guard (ADVICE r10): Arrow int64 with nulls converts via
    # to_numpy() to float64 + NaN, wrecking searchsorted indices and
    # raising on the int64 output cast — null-bearing edge lists stay on
    # the distributed loop, which carries a null-id row through its joins.
    if 0 < n_edges <= _DRIVER_CC_MAX_EDGES and dict(edges.dtypes) == {
        "src": "bigint", "dst": "bigint"
    } and (tbl := edges.toArrow()).column("src").null_count == 0 and tbl.column(
        "dst"
    ).null_count == 0:
        import numpy as np

        edges.unpersist()
        src = tbl.column("src").to_numpy()
        dst = tbl.column("dst").to_numpy()
        ids = np.unique(src)  # == all ids: the union above added both dirs
        si = np.searchsorted(ids, src)
        di = np.searchsorted(ids, dst)
        lab = np.arange(len(ids))
        while True:
            new = lab.copy()
            # Scatter-min of each neighbor's label (unbuffered, dup-safe),
            # then one pointer-doubling hop — labels are always member
            # INDICES of the same component and only decrease, so the
            # fixpoint is the component min, exactly as in the join form.
            np.minimum.at(new, si, lab[di])
            new = np.minimum(new, new[new])
            if np.array_equal(new, lab):
                break
            lab = new
        import pyarrow as pa

        out = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(ids[lab], pa.int64()),
            }
        )
        return pairs.sparkSession.createDataFrame(out)

    small = n_edges <= 5_000_000

    def maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .persist()
    )
    persisted = labels
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(maybe_b(labels), edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # Carry old vs new label through the same pass so convergence is one
        # cheap probe over the persisted frame, not a second full join.
        stepped = labels.join(
            maybe_b(neighbor_min), labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.col("cluster_id").alias("old_label"),
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
            ).alias("cand"),
        )
        # Pointer doubling: a label is itself a node id, so look up the
        # label's current label and adopt it if smaller.
        hop = labels.select(
            F.col("id").alias("pid"), F.col("cluster_id").alias("plabel")
        )
        # localCheckpoint, not persist: each round must TRUNCATE lineage.
        # A persisted frame still carries its full nested plan, so after r
        # rounds every action pays Catalyst planning over r stacked
        # AQE+InMemoryRelation trees — measured at ~4 s PER ACTION on a
        # 1.2k-node graph (and the driver, not the data, was the hot spot).
        # Checkpointed blocks replace the plan outright; on a cluster with
        # executor-loss concerns swap in reliable checkpointing
        # (sc.setCheckpointDir + .checkpoint()), same shape.
        merged = stepped.join(
            maybe_b(hop), stepped.cand == hop.pid, "left"
        ).select(
            "id",
            "old_label",
            F.least(
                F.col("cand"), F.coalesce("plabel", F.col("cand"))
            ).alias("cluster_id"),
        ).localCheckpoint(eager=True)
        converged = (
            merged.filter(F.col("cluster_id") != F.col("old_label")).count()
            == 0
        )
        persisted.unpersist()
        persisted = merged
        labels = merged.select("id", "cluster_id")
        if converged:
            break
    edges.unpersist()
    return labels


def exact_substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    eager: bool = False,
) -> DataFrame:
    """Cross-document EXACT-SUBSTRING dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): any ``k``-token window
    whose text occurs more than once in the corpus is removed from every
    occurrence EXCEPT the globally first (lowest ``(doc_id, position)``) —
    the keep-one-copy contract — and each document reassembles from its
    surviving tokens in order.

    Distributed shape (the suffix-array equivalent): every rolling window
    fingerprints to md5 of its joined tokens; a corpus-wide group-by on the
    fingerprint finds repeats with map-side partial counts (shuffle rows ∝
    corpus tokens — the inherent cost of corpus-level substring dedup; at
    100 TB this is one skinny (fp, key) shuffle, same order as tokenizing),
    the min occurrence key per fingerprint rides out of the same aggregate,
    and only NON-FIRST occurrences of repeated windows join back (shuffle ∝
    true duplication). Coverage expands each such window into its token
    positions; the rebuild is a per-row array filter — no further shuffle.

    Deterministic end-to-end, so the removed text itself is
    oracle-checkable. Docs shorter than ``k`` tokens pass through whole.

    Cache lifetime (ADVICE r13): the tokenized corpus is persisted for its
    three consumers; returned lazily that entry is CALLER-owned (cleared by
    ``spark.catalog.clearCache()`` or session end). Long-lived sessions
    should pass ``eager=True`` to materialize the result via
    ``localCheckpoint`` and unpersist the working set before return.

    Output: (id, n_tokens, n_removed, deduped_text).
    """
    # The tokenized corpus feeds THREE consumers (the window group-by side,
    # the window join-back side, and the final rebuild); unpersisted, Spark
    # re-scans and re-tokenizes the corpus for each — 3 parquet scans + 3
    # normalize/split passes in the before-plan (r13, guide §5: reuse whose
    # recompute is expensive). Cache lifetime is CALLER-owned, like
    # jaccard_verify's working set: the bench clears caches between passes,
    # and MEMORY_AND_DISK spills rather than evicting at corpus scale.
    toked = fan_out(
        df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(text_col), " ").alias("__toks"),
        ),
        barrier=True,
    ).persist()
    n = F.size("__toks")
    # One occurrence key per window: doc_id * 2^32 + pos orders globally.
    windows = (
        toked.filter(n >= k)
        .select(
            "id",
            F.explode(F.sequence(F.lit(0), n - k)).alias("pos"),
            "__toks",
        )
        .select(
            "id",
            "pos",
            # 128-bit window fingerprint as TWO seeded xxhash64 of the
            # sliced token ARRAY (16-byte shuffle key, no joined-string
            # materialization) instead of md5 of the joined text (32-char
            # string key). Equivalent grouping: tokens are space-split so
            # k-token windows are joined-string-bijective, and 128 bits
            # keeps corpus-scale collision odds negligible where a single
            # xxhash64 would collide past ~4B windows. The DuckDB oracle
            # keeps md5 — only the grouping matters, fp never leaves.
            F.struct(
                F.xxhash64(F.lit(0), F.slice("__toks", F.col("pos") + 1, k)),
                F.xxhash64(F.lit(1), F.slice("__toks", F.col("pos") + 1, k)),
            ).alias("fp"),
            (
                F.col("id").cast("bigint") * F.lit(1 << 32)
                + F.col("pos")
            ).alias("okey"),
        )
    )
    groups = windows.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min("okey").alias("first_key"),
    )
    removed = (
        windows.join(
            groups.filter(F.col("n_occ") > 1).select("fp", "first_key"),
            "fp",
        )
        .filter(F.col("okey") != F.col("first_key"))
        .select("id", F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("idx"))
        # collect_set dedups idx per id on its own (including map-side in
        # the partial aggregate) — a prior global distinct would shuffle
        # the expanded coverage rows a second time for nothing.
        .groupBy("id")
        .agg(F.collect_set("idx").alias("__rm"))
    )
    rebuilt = toked.join(removed, "id", "left").select(
        "id",
        "__toks",
        F.coalesce("__rm", F.array().cast("array<int>")).alias("__rm"),
    )
    kept = F.filter(
        F.transform(
            "__toks",
            lambda t, i: F.when(
                F.array_contains("__rm", i), F.lit(None)
            ).otherwise(t),
        ),
        lambda x: x.isNotNull(),
    )
    out = rebuilt.select(
        "id",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.size("__rm").cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("deduped_text"),
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        toked.unpersist()
    return out


def simhash64_blocks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash as four 16-bit block columns (b0..b3) — the production
    bit width. The 16-bit demo (:func:`simhash16`) saturates on dense
    corpora: its 4-bit nibble blocks have cardinality 16, so every blocking
    bucket holds ~n/16 docs and candidate pairs grow quadratically (3.8M at
    sf0.1). Sixteen-bit blocks have cardinality 65536 — a bucket collision
    now requires 16 consecutive identical bits, which near-dups have and
    random docs almost never do, so candidates track true near-dups.

    Blocks stay unpacked (4 small ints, not one packed int64) so no sign
    tricks are needed at bit 63 in any engine and the blocking key IS a
    column. Same plan as simhash16: one distinct-token explode, one wide
    hash-agg; everything scan-side before it. Same one-row-per-id
    precondition as :func:`simhash16`.
    """
    toks = fan_out(df).select(
        F.col(id_col).alias("id"),
        # array_distinct inside the row replaces a corpus-wide (id, tok)
        # .distinct() exchange — duplicates are intra-doc only (guide §2.4),
        # and the SWAR groupBy("id") below regains map-side partials.
        F.explode(F.array_distinct(F.split(normalize_text(text_col), " "))).alias(
            "tok"
        ),
    )
    h = toks.select(
        "id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint").alias("lo"),
        F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("bigint").alias("hi"),
    )
    # SWAR accumulation: 64 per-bit counters packed as 16 bigint words of
    # four 16-bit lanes (word w, lane l ← bit 4w+l). One token adds its bit
    # into a lane with two shifts and a mask — no per-bit CASE — and the
    # aggregate is 16 sums instead of 64, which quarters both the generated
    # code (the 64-sum form paid ~5s of whole-stage-codegen compile on
    # first run) and the partial-agg row width. Lane capacity 65535
    # distinct tokens per doc; s_j>0 ⟺ 2·cnt_j>n, so the signature is
    # bit-identical to the ±1-sum definition the oracle replays.
    words = h.select(
        "id",
        *[
            sum(
                F.shiftleft(
                    F.shiftright(
                        F.col("lo") if (4 * w + l) < 32 else F.col("hi"),
                        (4 * w + l) % 32,
                    ).bitwiseAND(F.lit(1)),
                    16 * l,
                )
                for l in range(4)
            ).alias(f"p{w}")
            for w in range(16)
        ],
    )
    sums = words.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"p{w}").alias(f"c{w}") for w in range(16)],
    )
    out_cols = []
    for k in range(4):
        blk = F.lit(0)
        for i in range(16):
            j = 16 * k + i
            cnt = F.shiftright(F.col(f"c{j // 4}"), 16 * (j % 4)).bitwiseAND(
                F.lit(0xFFFF)
            )
            blk = blk + F.when(cnt * 2 > F.col("n"), F.lit(1 << i)).otherwise(
                F.lit(0)
            )
        out_cols.append(blk.cast("int").alias(f"b{k}"))
    return sums.select("id", *out_cols)


def simhash64_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, cache: bool = True
) -> DataFrame:
    """Hamming(64-bit simhash) <= max_hamming pairs via pigeonhole blocking
    on the four 16-bit blocks: <= 3 differing bits cannot touch all 4
    blocks, so qualifying pairs share at least one (block_idx, block_value)
    key. Identical contract to :func:`simhash_near_pairs`, but the block
    cardinality (65536 vs 16) keeps buckets near-singleton on dense
    corpora — candidates ∝ true near-dups, not n²/16.
    """
    if max_hamming >= 4:
        raise ValueError("pigeonhole blocking needs max_hamming < 4 blocks")
    blocks = F.array(
        *[
            F.struct(F.lit(k).alias("blk"), F.col(f"b{k}").alias("val"))
            for k in range(4)
        ]
    )
    keyed = sigs.select(
        "id", "b0", "b1", "b2", "b3", F.explode(blocks).alias("k")
    ).select(
        "id", "b0", "b1", "b2", "b3",
        F.col("k.blk").alias("blk"), F.col("k.val").alias("val"),
    )
    if cache:
        keyed = keyed.persist()
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")).cast("int")
        )
        for k in range(4)
    )
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def incremental_fuzzy_dedup(
    batch: DataFrame,
    index: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Ingest-time NEAR-dup dedup of one arriving batch against a historical
    LSH bucket index — the fuzzy companion of the exact streaming ingest
    path (:func:`lakeflow.streaming.sinks.stream_dedup_ingest`), and how a
    continuously-growing 100 TB corpus stays near-dup-free without periodic
    full-corpus MinHash sweeps: the history is represented ONLY by its
    distinct ``(band, bh)`` bucket keys (two slim columns, ∝ corpus docs ×
    bands, never the text), and a batch doc is dropped when any of its
    bands lands in an indexed bucket.

    Within the batch the rule is deterministic bucket-leader-wins: a doc
    survives iff it is the min-id member of EVERY bucket it occupies (and
    no bucket is historical). This one-pass form is the distributed
    approximation of sequential arrival — order-free, replayable, and
    exactly expressible in SQL for the oracle — at the price of
    occasionally dropping a doc whose only lower-id bucket-mate was itself
    dropped (strictly conservative: never admits a near-dup).

    Returns ``(survivor_ids, survivor_buckets)``: append the second to the
    index table for the next batch. Cost per batch: signature construction
    (scan-side) + one semi-join against the index on (band, bh).
    """
    banded = band_buckets(
        minhash_signatures(
            word_shingles(batch, text_col=text_col, id_col=id_col, n=shingle_n),
            num_hashes=num_hashes,
        ),
        bands=bands,
        rows_per_band=rows_per_band,
    # Referenced by the index probe, the leader rule, AND the survivor
    # bucket extraction — persist so the shingle→signature pipeline (the
    # dominant cost, as in lsh_candidate_pairs) runs once per batch.
    ).persist()
    dropped = None
    if index is not None:
        hist_hit = (
            banded.join(index, ["band", "bh"], "left_semi")
            .select("id")
            .distinct()
        )
        dropped = hist_hit
    leaders = banded.groupBy("band", "bh").agg(F.min("id").alias("lead"))
    non_leader = (
        banded.join(leaders, ["band", "bh"])
        .filter(F.col("id") != F.col("lead"))
        .select("id")
        .distinct()
    )
    dropped = non_leader if dropped is None else dropped.union(non_leader)
    survivors = (
        batch.select(F.col(id_col).alias("id"))
        .distinct()
        .join(dropped.distinct(), "id", "left_anti")
        .select(F.col("id").alias(id_col))
    )
    survivor_buckets = (
        banded.join(
            survivors.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
        .select("band", "bh")
        .distinct()
    )
    return survivors, survivor_buckets


def prefix_filtered_pairs(shingles: DataFrame, threshold: float) -> DataFrame:
    """EXACT all-pairs candidate generation via prefix filtering (Bayardo et
    al., "Scaling Up All Pairs Similarity Search", WWW'07 — the All-Pairs /
    PPJoin family): the pruning-based alternative to MinHash-LSH candidates
    with NO false negatives.

    J(x,y) ≥ t implies |x∩y| ≥ t·max(|x|,|y|), so after ordering each doc's
    shingles by ascending global document frequency (rarest first,
    shingle as tie-break), two qualifying docs MUST share a token inside
    their first ``sz − ⌈t·sz⌉ + 1`` tokens — everything past the prefix can
    be skipped, and rare-first ordering makes the surviving prefix tokens
    the least likely to collide. Length filtering (t·sz_b ≤ sz_a ≤ sz_b/t)
    prunes cross-size pairs before the distinct.

    Cost shape at 100 TB: one shuffle on shingle for the frequency join,
    one per-doc window sort, and a candidate join that touches only prefix
    tokens — versus the full shingle self-join's quadratic blowup on every
    stop-word. Returns (id_a, id_b) candidates; verify with
    :func:`jaccard_verify` at the same threshold.
    """
    from pyspark.sql import Window

    freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    keyed = shingles.join(freq, "shingle")
    by_doc = Window.partitionBy("id")
    sized = keyed.select(
        "id",
        "shingle",
        F.row_number().over(by_doc.orderBy("df", "shingle")).alias("rn"),
        F.count(F.lit(1)).over(by_doc).alias("sz"),
    )
    prefix = sized.filter(
        F.col("rn")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    )
    a = prefix.select(
        F.col("id").alias("id_a"), "shingle", F.col("sz").alias("sz_a")
    )
    b = prefix.select(
        F.col("id").alias("id_b"), "shingle", F.col("sz").alias("sz_b")
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("sz_a") >= F.lit(threshold) * F.col("sz_b"))
        .filter(F.col("sz_b") >= F.lit(threshold) * F.col("sz_a"))
        .select("id_a", "id_b")
        .distinct()
    )


def prefix_filtered_jaccard_join(
    shingles: DataFrame, threshold: float
) -> DataFrame:
    """EXACT similarity self-join (Jaccard ≥ ``threshold``) — the PPJoin
    upgrade of :func:`prefix_filtered_pairs` + :func:`jaccard_verify`,
    restructured around ONE per-doc aggregation so the whole join is three
    shuffles instead of seven:

    1. global document frequencies, then each doc's distinct shingles fold
       into a single rare-first-ordered ARRAY (``array_sort`` over
       (df, shingle) structs — same canonical order as the window form,
       no per-doc window sort);
    2. only the prefix slice (``sz − ⌈t·sz⌉ + 1`` tokens) explodes back
       out, carrying its POSITION: candidates equi-join on prefix token
       with the length filter (t·sz_b ≤ sz_a ≤ sz_b/t) plus PPJoin's
       positional filter — a match at ranks (ra, rb) bounds the overlap by
       ``min(ra, rb) + min(sz_a − ra, sz_b − rb)``, which must reach
       α = ⌈t/(1+t)·(sz_a+sz_b)⌉, the Jaccard-equivalent overlap
       requirement (an upper bound of the true overlap can't be under α
       when J ≥ t, so no true pair is lost);
    3. verification is a projection, not a join tree: survivors pull the
       two doc arrays and ``array_intersect`` counts the overlap in one
       vectorized pass — no candidate×shingle row explosion, no pair-level
       re-aggregation.

    Cost shape at 100 TB: the arrays are O(doc length) — the same bytes as
    the text column itself — and every pairwise byte moved is a *verified
    candidate*, not a raw shingle match. Returns (id_a, id_b, jaccard ≥ t),
    jaccard rounded to 6dp (engine-neutral)."""
    t = float(threshold)
    freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    docs = (
        shingles.join(freq, "shingle")
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias(
                "__ord"
            )
        )
        .select(
            "id",
            F.transform("__ord", lambda x: x["shingle"]).alias("arr"),
        )
        .select("id", "arr", F.size("arr").alias("sz"))
    )
    plen = F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    pre = docs.select(
        "id",
        "sz",
        F.posexplode(F.slice("arr", F.lit(1), plen.cast("int"))).alias(
            "__pos", "shingle"
        ),
    ).select("id", "sz", (F.col("__pos") + 1).alias("rn"), "shingle")
    a = pre.select(
        F.col("id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.col("rn").alias("rn_a"),
        "shingle",
    )
    b = pre.select(
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("rn").alias("rn_b"),
        "shingle",
    )
    alpha = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("sz_a") + F.col("sz_b"))
    )
    # Pair-level positional filter: the rare-first order is one GLOBAL
    # canonical order, so among a pair's shared tokens the canonically
    # first — the one at (min rn_a, min rn_b); both minima are the same
    # token — precedes every other shared token in BOTH docs, bounding the
    # overlap by 1 + min(remaining suffix lengths). The per-pair groupBy
    # replaces the plain distinct (same shuffle), so the filter is free.
    first_match_ub = F.lit(1) + F.least(
        F.col("sz_a") - F.min("rn_a"), F.col("sz_b") - F.min("rn_b")
    )
    cands = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("sz_a") >= F.lit(t) * F.col("sz_b"))
        .filter(F.col("sz_b") >= F.lit(t) * F.col("sz_a"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(first_match_ub.alias("__ub"))
        .filter(F.col("__ub") >= alpha)
        .select("id_a", "id_b")
    )
    av = docs.select(
        F.col("id").alias("id_a"),
        F.col("arr").alias("__arr_a"),
        F.col("sz").alias("__sz_a"),
    )
    bv = docs.select(
        F.col("id").alias("id_b"),
        F.col("arr").alias("__arr_b"),
        F.col("sz").alias("__sz_b"),
    )
    inter = F.size(F.array_intersect("__arr_a", "__arr_b"))
    return (
        cands.join(av, "id_a")
        .join(bv, "id_b")
        .select(
            "id_a",
            "id_b",
            rnd(
                inter / (F.col("__sz_a") + F.col("__sz_b") - inter), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )
