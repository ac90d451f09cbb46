"""Determinism + scale-parameterization guards for the similarity/dedup
layer (VERDICT r1 items 6/8/9)."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_ivf_centroids_deterministic_under_repartition(spark):
    """Centroid choice is a pure vec_id predicate: any physical layout of
    the input yields the identical result set (the `.limit()` plan
    dependence VERDICT r1 flagged is gone)."""
    from foundry_es_spark.queries.common import table
    from foundry_es_spark.queries.similarity import ann_ivf_probe

    base = sorted(tuple(r) for r in ann_ivf_probe(spark, SF).collect())
    rep = sorted(
        tuple(r)
        for r in ann_ivf_probe(
            spark, SF, e=table(spark, SF, "embeddings").repartition(7)
        ).collect()
    )
    assert base == rep and len(base) > 0


def test_lsh_planes_scale_with_corpus():
    """The documented bucket-cardinality formula: fixed floor at toy scale,
    growing to 2^24 buckets at 10^9 rows — no hard ceiling."""
    from foundry_es_spark.queries.similarity import N_PLANES, planes_for_corpus

    assert planes_for_corpus(500) == N_PLANES
    assert planes_for_corpus(10**6) == 14
    assert planes_for_corpus(10**9) == 24


def test_simhash_blockpair_equals_reference_pairs(spark):
    """The C(B,2) block-pair bucketing must return EXACTLY the pairs a
    brute-force hamming scan finds (full recall for d <= max_hamming)."""
    from pyspark.sql import functions as F

    from foundry_es_spark.queries.dedup import dedup_simhash, dedup_simhash_pairs

    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup_simhash_pairs(spark, SF).collect()
    )
    sig = dedup_simhash(spark, SF)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("h_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("h_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("bigint"))
        .where(F.col("hamming") <= 3)
    )
    want = sorted((r["doc_a"], r["doc_b"], r["hamming"]) for r in brute.collect())
    assert got == want


def test_no_forced_broadcast_in_scaling_relational_queries():
    """q2/q3/q9 must not hard-code broadcast on SF-scaling dims (customer);
    constant-size dims (nation=25, region=5 rows) may keep the hint."""
    import inspect

    from foundry_es_spark.queries import relational as R

    for fn in (R.q2_join_orders_customer, R.q3_multiway_join_revenue, R.q9_rollup_revenue):
        src = inspect.getsource(fn)
        assert "broadcast(c)" not in src, fn.__name__


def test_lang_id_udf_has_no_per_row_python():
    """BASELINE.json: no per-row Python. The lang-id pandas_udf body must
    be free of row-wise map/apply lambdas (code lines only, not comments)."""
    import inspect

    from foundry_es_spark.queries.textstats import _lang_id_udf

    src = inspect.getsource(_lang_id_udf.func)
    code = "\n".join(ln.split("#", 1)[0] for ln in src.splitlines())
    assert ".map(lambda" not in code and ".apply(lambda" not in code
