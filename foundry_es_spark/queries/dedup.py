"""Deduplication operators over `documents` — the training-data-pipeline
layer: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the point of each design):
- exact dedup is a single hash-aggregate — one shuffle on a 64-char key,
  map-side combine collapses duplicates early;
- MinHash/LSH never compares all pairs: signatures are computed per-row
  with JVM higher-order functions (no UDF), candidates come from an
  equi-join on (band, band_hash) — at 100 TB this is the only shape that
  works (all-pairs is O(n²));
- SimHash is a per-row 64-bit signature via one aggregate over word
  hashes; near-dup pairs = equal signatures (or banded prefixes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from foundry_es_spark.queries.common import table

# ------------------------------------------------------------------ exact


def dedup_exact(spark, sf):
    d = table(spark, sf, "documents")
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("text_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_copies") > 1)
    )


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def dedup_exact_keep_first(spark, sf):
    """The apply side: keep min-doc_id representative per distinct text."""
    d = table(spark, sf, "documents")
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("text_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


DEDUP_EXACT_KEEP_SQL = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
"""

# ------------------------------------------------------- shingles helpers


def _word_shingles(words_col, k: int = 3):
    """k-word shingles as an array<string> from a PRE-MATERIALIZED word
    array column, built JVM-side: slide over the array. Callers must
    project `split(lower(text))` into its own column first — inlining the
    split into this lambda would re-split the full text once per shingle
    (O(words^2) per document; visible as `split` inside the lambda in the
    physical plan). Empty/short docs yield the whole-doc join (1 shingle).
    """
    words = F.col(words_col) if isinstance(words_col, str) else words_col
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )


def _shingle_sets(d, k: int = 3):
    """(doc_id, sh): distinct k-word shingle sets, split materialized once."""
    return d.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("w")
    ).select("doc_id", F.array_distinct(_word_shingles("w", k)).alias("sh"))


# ----------------------------------------------------------- minhash+LSH

N_HASHES = 16
N_BANDS = 4  # 4 rows per band


def _minhash_signature(hashed):
    """16-lane minhash over PRE-HASHED shingles (array<long>): per-lane
    re-hash of the long — 8-byte input, far cheaper than hashing the
    shingle string 16 times. Callers materialize the base hash array in
    its own projection so it is computed exactly once.

    Two traps shaped this expression:
    - The lane number must NOT come from a two-parameter lambda
      (``lambda h, i=i: ...``): PySpark dispatches ``transform`` on lambda
      arity and calls two-parameter lambdas as (element, array_index), so
      the index silently overrode the captured lane and collapsed all 16
      lanes to the same ``min_j xxhash64(h_j, j)`` value — LSH banding
      degenerated to a single band for two rounds. Regression-pinned by
      test_determinism's lane-independence test.
    - One aggregate fold maintaining 16 running minima beats 16 per-lane
      ``transform``+``array_min`` passes (~20 % on the signature stage at
      sf0.1: n 16-wide intermediates instead of 16 n-wide ones — the same
      shape win as simhash's counts fold). Verified element-identical to
      the per-lane formulation before switching."""
    lanes = F.sequence(F.lit(0), F.lit(N_HASHES - 1))
    return F.aggregate(
        hashed,
        F.array_repeat(F.lit((1 << 63) - 1), N_HASHES),
        lambda acc, h: F.zip_with(acc, lanes, lambda a, lane: F.least(a, F.xxhash64(h, lane))),
    )


def add_minhash_bands(df, text_col: str = "text", out_col: str = "bhs"):
    """Append ``out_col`` = array<long> of the N_BANDS LSH band hashes for
    ``text_col`` — the reusable signature kernel shared by the batch LSH
    query below and the incremental maintainer
    (plans/dedup_maintain.py). Both paths MUST hash identically: the
    maintainer's core invariant (incremental pair set == batch pair set
    over the final corpus) holds only because the signatures are
    bit-identical functions of the text.

    Staged ``select`` projections keep split → shingle → hash → minhash
    each evaluated once per row (see the `_word_shingles` note: inlining
    the split into the shingle lambda re-splits the text per shingle)."""
    rows_per_band = N_HASHES // N_BANDS
    keep = list(df.columns)
    out = df.select(*keep, F.split(F.lower(F.col(text_col)), r"\s+").alias("_w"))
    out = out.select(*keep, F.array_distinct(_word_shingles("_w")).alias("_sh"))
    out = out.select(
        *keep, F.transform(F.col("_sh"), lambda x: F.xxhash64(x)).alias("_hsh")
    )
    out = out.select(*keep, _minhash_signature(F.col("_hsh")).alias("_sig"))

    def _band_hash(b):
        return F.xxhash64(
            *[F.element_at("_sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
        )

    return out.select(
        *keep, F.array(*[_band_hash(b) for b in range(N_BANDS)]).alias(out_col)
    )


def add_shingle_set(df, text_col: str = "text", out_col: str = "sh"):
    """Append ``out_col`` = distinct 3-word shingle set for ``text_col``
    (the exact-Jaccard verification input, same shingling as the
    signatures above)."""
    keep = list(df.columns)
    out = df.select(*keep, F.split(F.lower(F.col(text_col)), r"\s+").alias("_w"))
    return out.select(*keep, F.array_distinct(_word_shingles("_w")).alias(out_col))


def dedup_minhash_lsh(spark, sf, jaccard_threshold: float = 0.5):
    """Candidate pairs via LSH banding, verified with exact shingle Jaccard.

    No SQL oracle (xxhash64 is Spark-specific) — rows-only check; exact
    Jaccard verification is covered by `dedup_ngram_jaccard`'s oracle.
    """
    d = table(spark, sf, "documents")
    rows_per_band = N_HASHES // N_BANDS
    # shingle sets computed once; the banded self-join carries ONLY
    # (doc_id, band, band_hash) — never the shingle arrays (at 100 TB the
    # candidate set is tiny relative to the corpus, so the join-back to
    # shingles touches few rows, while arrays through the band exchange
    # would 4x the shuffle)
    sh = _shingle_sets(d)
    sig = (
        sh.select("doc_id", F.transform(F.col("sh"), lambda x: F.xxhash64(x)).alias("hsh"))
        .select("doc_id", _minhash_signature(F.col("hsh")).alias("sig"))
    )
    # all band hashes as ONE array (N_BANDS longs, ~64 bytes) so the join
    # can decide "is this the FIRST band where the two docs agree" without
    # a dropDuplicates SHUFFLE over the candidate set (same trick as
    # dedup_simhash_pairs): a pair agreeing in k bands appears in k band
    # buckets, and we keep only the occurrence whose band index equals the
    # first position where the two band-hash arrays match.
    #
    # The exploded (band, bh) pair is built from xxhash64 DIRECTLY (never
    # null) rather than element_at(bhs, …): with a nullable bh, the join
    # key's isnotnull constraint inlines the whole shingle→minhash→band
    # expression into a scan-level Filter, recomputing the signature per
    # row — measured 5× wall on the bench corpus before this shape.
    def _band_hash(b):
        return F.xxhash64(
            *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
        )

    banded = sig.select(
        "doc_id",
        F.array(*[_band_hash(b) for b in range(N_BANDS)]).alias("bhs"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _band_hash(b).alias("bh"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bhs", "bb.band", "bb.bh")
    left = banded.alias("l")
    right = banded.alias("r")
    first_agree = (
        F.array_position(
            F.zip_with(F.col("l.bhs"), F.col("r.bhs"), lambda a, b: a == b),
            F.lit(True),
        )
        - 1
    )
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .where(F.col("l.band") == first_agree)
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
    )
    pairs = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 4))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )

# ---------------------------------------------------------------- simhash


def dedup_simhash(spark, sf):
    """64-bit SimHash per doc, built with one JVM-side aggregate: for each
    bit b, sum ±1 over word hashes; bit set if the sum is positive.
    Rows-only check (hash-function-specific)."""
    d = table(spark, sf, "documents")
    # SQL expressions because shiftleft/shiftright take Column bit-counts
    # only in SQL form; still 100% JVM-side higher-order functions.
    # One zip_with per word against the constant bit-index sequence — the
    # earlier form built an intermediate 64-element transform() array per
    # word, which dominated the whole query (measured 7.4x slower at sf0.1).
    counts_expr = r"""
      aggregate(
        transform(array_distinct(split(lower(text), '\\s+')), w -> xxhash64(w)),
        array_repeat(0L, 64),
        (acc, h) -> zip_with(acc, sequence(0, 63),
          (a, b) -> a + IF((shiftright(h, CAST(b AS INT)) & 1L) = 1L, 1L, -1L)))
    """
    simhash_expr = """
      aggregate(
        zip_with(counts, sequence(0, 63),
                 (c, b) -> IF(c > 0, shiftleft(1L, CAST(b AS INT)), 0L)),
        0L, (acc, x) -> acc | x)
    """
    return (
        d.selectExpr("doc_id", f"({counts_expr}) AS counts")
        .selectExpr("doc_id", f"({simhash_expr}) AS simhash")
    )


def dedup_simhash_pairs(spark, sf, max_hamming: int = 3):
    """Near-dup pairs by SimHash, bucketed the scale-safe way (Manku et
    al.'s multi-block scheme, restated):

    Split the 64-bit signature into B = max_hamming + 2 blocks. A pair
    within hamming distance d ≤ max_hamming differs in at most d blocks, so
    at least B − d ≥ 2 blocks agree — therefore every such pair shares at
    least one *block-pair* key. Joining on all C(B,2) block-pair combos
    gives a key space of 2^(2·64/B) values (≈2^25 for d=3) instead of the
    2^16 per-band ceiling VERDICT r1 flagged: at 10^9 docs the expected
    bucket occupancy is ~n/2^25 ≈ 30 rows, so the per-bucket self-join
    stays linear. Explode factor is C(B,2)=10 key rows per doc (narrow:
    doc_id + two ints + a long), and recall for d ≤ max_hamming is exact —
    the final pairs are identical to the single-band scheme because both
    verify the true hamming distance. Rows-only check."""
    n_blocks = max_hamming + 2
    widths = [64 // n_blocks + (1 if i < 64 % n_blocks else 0) for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]

    def _block(i):
        return F.shiftright(F.col("simhash"), offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    combos = [(i, j) for i in range(n_blocks) for j in range(i + 1, n_blocks)]
    sig = dedup_simhash(spark, sf)
    keyed = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("combo"),
                        # combined key: block_i bits above block_j bits
                        (
                            F.shiftleft(_block(i), widths[j]).bitwiseOR(_block(j))
                        ).alias("bh"),
                    )
                    for ci, (i, j) in enumerate(combos)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.combo", "bb.bh")
    l, r = keyed.alias("l"), keyed.alias("r")
    cand = l.join(
        r,
        (F.col("l.combo") == F.col("r.combo"))
        & (F.col("l.bh") == F.col("r.bh"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(
        F.col("l.doc_id").alias("doc_a"),
        F.col("r.doc_id").alias("doc_b"),
        F.col("l.simhash").alias("h_a"),
        F.col("r.simhash").alias("h_b"),
        F.col("l.combo").alias("combo"),
    )
    # A pair agreeing in k blocks lands in C(k,2) combo buckets; instead of
    # a dropDuplicates SHUFFLE over the candidate set, keep each pair only
    # in its FIRST agreeing combo — recomputable from the two signatures in
    # the row, so dedup is a narrow filter with no exchange.
    def _blk_of(col, i):
        return F.shiftright(col, offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))

    agree = F.array(
        *[
            (_blk_of(F.col("h_a"), i) == _blk_of(F.col("h_b"), i))
            & (_blk_of(F.col("h_a"), j) == _blk_of(F.col("h_b"), j))
            for (i, j) in combos
        ]
    )
    cand = cand.where(
        F.col("combo") == F.array_position(agree, F.lit(True)) - 1
    ).drop("combo")
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", hamming.cast("bigint")).where(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")

# ----------------------------------------------------------- n-gram jaccard


def dedup_ngram_jaccard(spark, sf):
    """Exact 3-word-shingle Jaccard for adjacent doc_id pairs — the
    SQL-checkable twin of the LSH path (deterministic candidate set keeps
    the oracle O(n))."""
    d = table(spark, sf, "documents")
    sh = _shingle_sets(d)
    a = sh.alias("a")
    b = sh.select((F.col("doc_id") - 1).alias("doc_id"), F.col("sh").alias("sh_b")).alias("b")
    pairs = a.join(b, "doc_id")
    inter = F.size(F.array_intersect(F.col("sh"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh"), F.col("sh_b")))
    return pairs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1).alias("doc_b"),
        F.round(inter / union, 4).alias("jaccard"),
    )


# DuckDB twin: same shingling via list comprehension over string_split
DEDUP_NGRAM_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+2], ' ')
                        FOR i IN range(1, greatest(len(words) - 2, 1) + 1)]) AS s
  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
             len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


# --------------------------------------------------- duplicate clustering


def dedup_cluster(
    spark,
    sf,
    chunk_words: int = 8,
    max_iter: int = 16,
    checkpoint_dir: str | None = None,
):
    """Connected components over the duplicate graph — the cluster-collapse
    step of a dedup pipeline (pairs alone can't pick one representative
    when A~B and B~C but A!~C). cluster_id = min doc_id in the component.

    Edges (both deterministic, so the oracle is exact SQL):
    - near-dup: docs sharing ANY full `chunk_words`-word chunk (fixed
      offsets, sha256 of the chunk string) — star edges to each chunk
      group's min doc. Overlap on DIFFERENT chunks chains A-B-C into one
      component, which is exactly what the CC pass exists to collapse.
      Shared-chunk is an equi-join on the chunk hash (no all-pairs scan)
      — the same shape MinHash banding has, but hash-function-free so
      DuckDB can replay it exactly. sha256 (64-char string) is chosen
      ONLY for that exact-oracle property; at production scale swap the
      join key to `xxhash64(c)` — an 8-byte long, shrinking the chunk
      shuffle ~8× with negligible collision odds (~n²/2⁶⁴);
    - exact-dup: docs sharing a full-text sha256 (covers docs shorter
      than one chunk).

    Algorithm: min-label propagation with POINTER JUMPING. Each round (a)
    every node takes the min label over itself and its neighbours, then (b)
    label <- label(label) (one self-join shortcut). (a) alone needs
    O(diameter) rounds — a 10^4-long chain of near-dup crawl snapshots
    would need 10^4 shuffles; the shortcut makes it O(log n) (Kiveris et
    al., "Connected Components in MapReduce and Beyond", two-phase
    star-contraction restated as label pointer-jumping). Per round: two
    shuffles over the EDGE set only — the corpus joins in exactly once at
    the end (`coalesce(label, doc_id)`), so at 100 TB the iteration cost
    scales with duplicate-graph size (small) not corpus size.
    `localCheckpoint` truncates the growing lineage so round k's plan does
    not replay rounds 1..k-1. localCheckpoint stores blocks on executors,
    so on a real cluster one lost executor kills the job mid-iteration;
    pass ``checkpoint_dir`` (HDFS/S3 path on a cluster) to use reliable
    ``DataFrame.checkpoint()`` instead — identical labels, fault-tolerant
    lineage truncation. Local default stays executor-resident (cheaper,
    and a single-JVM local run has no executor-loss mode).
    """
    prev_ckpt = None
    if checkpoint_dir is not None:
        import os as _os
        import uuid as _uuid

        sc = spark.sparkContext
        try:
            # remember the session's prior dir — setCheckpointDir is
            # GLOBAL, and this call must not redirect other consumers
            opt = sc._jsc.sc().getCheckpointDir()
            prev_ckpt = opt.get() if opt.isDefined() else None
        except Exception:
            prev_ckpt = None
        # namespace per call: reliable checkpoints are never auto-deleted
        # (cleanCheckpoints is off by default), so each run's data lives
        # under its own cc-<id> subdir — the caller can delete it once the
        # returned labels are materialized/persisted
        sc.setCheckpointDir(_os.path.join(checkpoint_dir, f"cc-{_uuid.uuid4().hex[:12]}"))
        _truncate = lambda df: df.checkpoint()  # noqa: E731
    else:
        _truncate = lambda df: df.localCheckpoint()  # noqa: E731
    try:
        return _dedup_cluster_body(spark, sf, chunk_words, max_iter, _truncate)
    finally:
        # ADVICE r4: restore the GLOBAL checkpoint dir on every exit path
        # (an exception mid-iteration must not leave later consumers
        # pointed at this call's cc-<id> namespace); a session with no
        # prior dir gets the caller's PARENT dir, not our private subdir
        if checkpoint_dir is not None:
            sc.setCheckpointDir(prev_ckpt if prev_ckpt is not None else checkpoint_dir)


def _dedup_cluster_body(spark, sf, chunk_words, max_iter, _truncate):
    d = table(spark, sf, "documents")
    words = F.split(F.lower(F.col("text")), r"\s+")
    n_chunks = F.floor(F.size("w") / chunk_words).cast("int")
    chunks = (
        d.select("doc_id", words.alias("w"))
        # guard: Spark's sequence(0, -1) DESCENDS for docs shorter than one
        # chunk — filter them out instead (they still get whole-text edges)
        .where(F.size("w") >= chunk_words)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.concat_ws(" ", F.slice("w", i * chunk_words + 1, chunk_words)),
                )
            ).alias("c"),
        )
        .select("doc_id", F.sha2(F.col("c"), 256).alias("h"))
    )
    hashed = d.select(F.sha2(F.col("text"), 256).alias("h"), "doc_id")
    # star edges per hash group (chunk groups ∪ whole-text groups); edge
    # multiplicity from multi-chunk overlap is fine — the min-agg in the
    # loop dedups, so no distinct() shuffle here
    keyed = chunks.unionByName(hashed.select("doc_id", "h"))
    group_min = keyed.groupBy("h").agg(F.min("doc_id").alias("doc_a"))
    pair = (
        keyed.join(group_min, "h")
        .where(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
    )
    edges = (
        pair.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pair.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        # materialize once: the loop re-references edges every round, and
        # without this each round would replay the shingle/Jaccard scan
    )
    edges = _truncate(edges)
    # CC runs over nodes that appear in ANY edge; everything else is a
    # singleton and never enters the loop.
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = _truncate(nodes.select("doc_id", F.col("doc_id").alias("label")))
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "label")
        )
        stepped = (
            labels.unionByName(prop).groupBy("doc_id").agg(F.min("label").alias("label"))
        )
        jumped = (
            stepped.alias("s")
            .join(
                labels.select(F.col("doc_id").alias("label"), F.col("label").alias("ll")).alias("p"),
                "label",
            )
            .select("doc_id", F.least("ll", "label").alias("label"))
        )
        jumped = _truncate(jumped)
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .select("doc_id", F.coalesce("label", "doc_id").alias("cluster_id"))
    )


# DuckDB twin: transitive closure by recursive CTE (UNION-distinct bounds
# the fixpoint), then min reachable ancestor per node.
DEDUP_CLUSTER_SQL = """
WITH RECURSIVE
keyed AS (
  SELECT doc_id, sha256(array_to_string(words[i*8+1:i*8+8], ' ')) AS h
  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words FROM documents),
       UNNEST(range(0, greatest(len(words) // 8, 0))) AS t(i)
  UNION ALL
  SELECT doc_id, sha256(text) AS h FROM documents
),
pair AS (
  SELECT m.doc_a, k.doc_id AS doc_b
  FROM keyed k JOIN (SELECT h, min(doc_id) AS doc_a FROM keyed GROUP BY h) m USING (h)
  WHERE k.doc_id <> m.doc_a
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pair
  UNION SELECT doc_b, doc_a FROM pair
),
reach AS (
  SELECT doc_id AS node, doc_id AS anc FROM documents
  UNION
  SELECT e.b, r.anc FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(anc) AS cluster_id FROM reach GROUP BY node
"""


def dedup_cluster_collapse(spark, sf):
    """The materialization step after clustering: one representative (the
    min-doc_id member, which IS the cluster_id) per duplicate cluster plus
    member count — the kept corpus a training-data pipeline writes out.
    One extra hash-aggregate over the (doc_id, cluster_id) pairs and a
    join back to the corpus on the representative only."""
    cl = dedup_cluster(spark, sf)
    sizes = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    d = table(spark, sf, "documents")
    return sizes.join(d, sizes.cluster_id == d.doc_id).select(
        "cluster_id", "n_members", F.col("n_chars").alias("rep_n_chars")
    )


DEDUP_CLUSTER_COLLAPSE_SQL = """
WITH RECURSIVE
keyed AS (
  SELECT doc_id, sha256(array_to_string(words[i*8+1:i*8+8], ' ')) AS h
  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words FROM documents),
       UNNEST(range(0, greatest(len(words) // 8, 0))) AS t(i)
  UNION ALL
  SELECT doc_id, sha256(text) AS h FROM documents
),
pair AS (
  SELECT m.doc_a, k.doc_id AS doc_b
  FROM keyed k JOIN (SELECT h, min(doc_id) AS doc_a FROM keyed GROUP BY h) m USING (h)
  WHERE k.doc_id <> m.doc_a
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pair
  UNION SELECT doc_b, doc_a FROM pair
),
reach AS (
  SELECT doc_id AS node, doc_id AS anc FROM documents
  UNION
  SELECT e.b, r.anc FROM reach r JOIN edges e ON e.a = r.node
),
clusters AS (
  SELECT node AS doc_id, min(anc) AS cluster_id FROM reach GROUP BY node
)
SELECT cluster_id, count(*) AS n_members, d.n_chars AS rep_n_chars
FROM clusters JOIN documents d ON d.doc_id = cluster_id
GROUP BY cluster_id, d.n_chars
"""


# ------------------------------------------------- repeated n-gram mask


def dedup_repeated_ngrams(spark, sf, k: int = 8):
    """Cross-document repeated-substring detection at k-token granularity —
    the Spark shape of exact-substring training-set dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": mask every
    span that occurs verbatim elsewhere in the corpus; here spans are
    k-grams, the granularity the suffix-array approach reduces to after
    minimal-match-length clipping). Output: one row per document that
    contains at least one k-gram also present in ANOTHER document —
    (doc_id, n_grams, n_repeated gram positions, repeated_bp share).

    Unlike :func:`text_decontaminate` (tiny broadcast eval side), the
    repeated-gram set is corpus-sized, so this is the honest three-exchange
    shape and cannot be less:

    1. per-gram exchange for the distinct-document count (dedupe
       (g, doc_id) first so the count(*) HAVING >= 2 is a cheap second-level
       fold — partial map-side combine collapses a doc's internal
       repetitions before anything moves);
    2. shuffled equi-join of gram positions against the repeated-gram set
       (NOT broadcastable: duplicate mass at 100 TB is itself TB-scale);
    3. the per-doc aggregate (small — only hit rows survive the join).

    At production scale the join/agg key is ``xxhash64(g)`` (8 bytes
    instead of a ~50-byte string; ~n²/2⁶⁴ collision odds); the string key
    is kept here so the DuckDB twin can replay it exactly. The gram
    pipeline reuses decon_tokens/decon_grams and inherits both documented
    plan-trap fixes (clamped sequence bound, non-nullable join key)."""
    from foundry_es_spark.queries.textstats import decon_grams, decon_tokens

    d = table(spark, sf, "documents")
    pos = decon_grams(decon_tokens(d, k), k)
    repeated = (
        pos.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("g")
    )
    return (
        pos.join(repeated, "g")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_repeated"))
        .select(
            "doc_id",
            "n_grams",
            "n_repeated",
            F.floor((F.col("n_repeated") * 10000) / F.col("n_grams"))
            .cast("bigint")
            .alias("repeated_bp"),
        )
    )


DEDUP_REPEATED_NGRAMS_SQL = r"""
WITH grams AS (
  SELECT doc_id, CAST(len(w) - 7 AS BIGINT) AS n_grams,
         [array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 7 + 1)] AS gs
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents)
  WHERE len(w) >= 8
),
pos AS (SELECT doc_id, n_grams, unnest(gs) AS g FROM grams),
rep AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM pos)
  GROUP BY g HAVING count(*) >= 2
)
SELECT doc_id, n_grams, CAST(count(*) AS BIGINT) AS n_repeated,
       CAST(count(*) * 10000 // n_grams AS BIGINT) AS repeated_bp
FROM pos JOIN rep USING (g)
GROUP BY doc_id, n_grams
"""


# ----------------------------------------------------- segment scrub


def dedup_segment_scrub(spark, sf, seg_tokens: int = 8):
    """CCNet/RefinedWeb-style duplicated-segment REMOVAL with document
    reconstruction: split each document into non-overlapping
    ``seg_tokens``-token segments, drop every segment whose text occurs
    in at least one OTHER document, and reassemble the surviving segments
    in order. Where :func:`dedup_repeated_ngrams` only *reports* repeated
    spans, this emits the cleaned corpus — the actual output a training
    pipeline ships.

    Scale shape (same honest three exchanges as repeated-ngrams, and it
    cannot be fewer because the duplicate-segment set is corpus-sized):

    1. segment exchange for the distinct-document count (map-side combine
       collapses within-doc repeats first);
    2. shuffled equi-join of segment positions against the duplicated set
       (not broadcastable at 100 TB — duplicate mass is TB-scale);
    3. one per-doc aggregate that rebuilds the text: ``collect_list``
       skips NULLs, so kept segments ride through as (pos, seg) structs,
       ``array_sort`` restores document order JVM-side, ``array_join``
       re-concatenates — reconstruction costs no extra exchange beyond
       the aggregate itself and never touches Python.

    At production scale the join key is ``xxhash64(seg)``; the string key
    is kept so the DuckDB twin replays it exactly (same convention as
    dedup_repeated_ngrams).
    """
    d = table(spark, sf, "documents")
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_seg = (F.floor((F.size("w") - 1) / seg_tokens) + 1).cast("int")
    segs = (
        d.select("doc_id", w.alias("w"))
        .where(F.size("w") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_seg - 1)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "i",
            F.concat_ws(
                " ", F.slice("w", F.col("i") * seg_tokens + 1, seg_tokens)
            ).alias("seg"),
        )
    )
    dup = (
        segs.select("seg", "doc_id")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("seg", F.lit(True).alias("_dup"))
    )
    return (
        segs.join(dup, "seg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("_dup"), 1).otherwise(0)).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_dup").isNull(),
                                F.struct(
                                    F.col("i").alias("i"), F.col("seg").alias("s")
                                ),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )


DEDUP_SEGMENT_SCRUB_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents
),
segs AS (
  SELECT doc_id, i, array_to_string(w[i*8+1:i*8+8], ' ') AS seg
  FROM toks, UNNEST(range(0, (len(w)-1)//8 + 1)) AS t(i)
  WHERE len(w) > 0
),
dup AS (
  SELECT seg FROM (SELECT DISTINCT seg, doc_id FROM segs)
  GROUP BY seg HAVING count(*) >= 2
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN d.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       coalesce(
         string_agg(CASE WHEN d.seg IS NULL THEN s.seg END, ' ' ORDER BY s.i),
         '') AS cleaned_text
FROM segs s LEFT JOIN dup d ON s.seg = d.seg
GROUP BY s.doc_id
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_exact_keep_first": dedup_exact_keep_first,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_cluster": dedup_cluster,
    "dedup_cluster_collapse": dedup_cluster_collapse,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_repeated_ngrams": dedup_repeated_ngrams,
    "dedup_segment_scrub": dedup_segment_scrub,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_exact_keep_first": DEDUP_EXACT_KEEP_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_cluster": DEDUP_CLUSTER_SQL,
    "dedup_cluster_collapse": DEDUP_CLUSTER_COLLAPSE_SQL,
    "dedup_repeated_ngrams": DEDUP_REPEATED_NGRAMS_SQL,
    "dedup_segment_scrub": DEDUP_SEGMENT_SCRUB_SQL,
}
