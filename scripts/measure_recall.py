"""Measured recall of the probabilistic operators against exact ground
truth — the quantitative evidence behind the "rows-only by design"
entries on the driver board.

- MinHash-LSH (`dedup_minhash_lsh`): ground truth = ALL document pairs
  with exact 3-shingle Jaccard >= the threshold (O(n^2) self-join — only
  feasible at small sf, which is why this lives in a script, not the
  query surface). Precision is 1.0 by construction (every candidate is
  exact-Jaccard-verified), so the one number that matters is recall:
  found / truth. The analytic banding curve 1-(1-J^r)^b with r=4, b=4 is
  printed alongside for context — measured recall should track it.
  (This measurement is what would have caught the lane-collapse bug two
  rounds earlier: the degenerate kernel's recall curve was a single
  J-draw, not the banding curve.)
- SimHash block-pairs (`dedup_simhash_pairs`): ground truth = brute-force
  hamming <= d over all signature pairs. Recall is exact BY CONSTRUCTION
  (the C(B,2) block-pair scheme covers every pair within d); this
  measures it anyway — a 1.0 here is a regression canary, not a tautology.
- ANN (`ann_lsh_bucketed` / `ann_ivf_probe`): recall@k vs the exact
  bruteforce top-k, per recall knob (n_tables / n_probe) — the measured
  shape of the knobs the monotonicity tests pin directionally.

Usage: python scripts/measure_recall.py [--pairs-sf DIR] [--ann-sf DIR]
Prints one JSON line; a human-readable table goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from foundry_es_spark.queries import dedup as D  # noqa: E402
from foundry_es_spark.queries import similarity as S  # noqa: E402
from foundry_es_spark.queries.common import table  # noqa: E402
from foundry_es_spark.session import get_spark  # noqa: E402


def minhash_recall(spark, sf: str, threshold: float = 0.5) -> dict:
    d = table(spark, sf, "documents")
    sh = D._shingle_sets(d)
    a = sh.select(F.col("doc_id").alias("da"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("sh").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb"))
    truth = (
        a.crossJoin(b)
        .where(F.col("da") < F.col("db"))
        .where(jac >= threshold)
        .select("da", "db")
    )
    truth_set = {(r.da, r.db) for r in truth.collect()}
    found = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_minhash_lsh(spark, sf, jaccard_threshold=threshold).collect()
    }
    assert found <= truth_set, "verified pairs must be a subset of the exact truth"
    curve = {
        f"J={j}": round(1 - (1 - j ** (D.N_HASHES // D.N_BANDS)) ** D.N_BANDS, 3)
        for j in (0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
    }
    return {
        "truth_pairs": len(truth_set),
        "found_pairs": len(found),
        "recall": round(len(found) / len(truth_set), 4) if truth_set else None,
        "precision": 1.0,
        "banding_curve": curve,
    }


def simhash_recall(spark, sf: str, max_hamming: int = 3) -> dict:
    sig = D.dedup_simhash(spark, sf)
    a = sig.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    truth = (
        a.crossJoin(b)
        .where(F.col("da") < F.col("db"))
        .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming)
        .count()
    )
    found = D.dedup_simhash_pairs(spark, sf, max_hamming=max_hamming).count()
    return {
        "truth_pairs": truth,
        "found_pairs": found,
        "recall": round(found / truth, 4) if truth else None,
    }


def banding_curve_measured(spark, sf: str, variants_per_doc: int = 3) -> dict:
    """Measured LSH banding recall at BORDERLINE Jaccard — the part of the
    recall curve the real corpus can't exercise (its J >= 0.5 pairs are all
    exact duplicates, where every band agrees trivially).

    Deterministic synthetic pairs: each document gets `variants_per_doc`
    mutants with word-replacement rates spread over (doc_id, variant)
    (positions and rates hash-chosen, no RNG), covering J from ~0 to 1.
    Both sides run the PRODUCTION kernels (`add_minhash_bands`,
    `add_shingle_set` — the same expressions the batch query and the
    incremental maintainer share), candidate = the two band-hash arrays
    agree in ANY band (exactly the LSH join predicate on a known pair).
    Reported: measured agree-rate per J decile vs the analytic
    1-(1-J^r)^b curve at the decile's mean J. The measured rate should
    track the curve — this is the regression canary that would have
    caught the r1/r2 lane-collapse bug (whose measured curve was a single
    J-draw, not the banding curve)."""
    rows = table(spark, sf, "documents").select("doc_id", "text").collect()
    recs = []
    for r in rows:
        words = r.text.lower().split()
        for v in range(variants_per_doc):
            # replacement rate in {0, 5, ..., 55}% spread by (doc_id, v)
            m = (r.doc_id * variants_per_doc + v) % 12
            mut = [
                f"z{r.doc_id}x{i}"
                if (r.doc_id * 1000003 + i * 7919 + v * 104729) % 20 < m
                else w
                for i, w in enumerate(words)
            ]
            pid = r.doc_id * variants_per_doc + v
            recs.append((pid, 0, r.text))
            recs.append((pid, 1, " ".join(mut)))
    df = spark.createDataFrame(recs, "pair_id long, side int, text string")
    sig = D.add_minhash_bands(D.add_shingle_set(df), out_col="bhs")
    a = sig.where(F.col("side") == 0).select(
        "pair_id", F.col("sh").alias("sa"), F.col("bhs").alias("ba")
    )
    b = sig.where(F.col("side") == 1).select(
        "pair_id", F.col("sh").alias("sb"), F.col("bhs").alias("bb")
    )
    j = F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb"))
    agree = F.exists(F.zip_with("ba", "bb", lambda x, y: x == y), lambda e: e)
    per_pair = a.join(b, "pair_id").select(j.alias("j"), agree.cast("int").alias("hit"))
    decile = F.least(F.floor(F.col("j") * 10), F.lit(9))
    got = (
        per_pair.groupBy(decile.alias("d"))
        .agg(F.count("*").alias("n"), F.avg("hit").alias("measured"), F.avg("j").alias("mean_j"))
        .orderBy("d")
        .collect()
    )
    r_, b_ = D.N_HASHES // D.N_BANDS, D.N_BANDS
    return {
        f"J[{r.d/10:.1f},{(r.d+1)/10:.1f})": {
            "n": r.n,
            "measured": round(r.measured, 3),
            "analytic": round(1 - (1 - r.mean_j**r_) ** b_, 3),
        }
        for r in got
    }


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.n_id)
    return out


def _recall_at_k(approx: dict, exact: dict) -> float:
    per_q = [
        len(approx.get(q, set()) & exact[q]) / len(exact[q]) for q in exact if exact[q]
    ]
    return round(sum(per_q) / len(per_q), 4) if per_q else float("nan")


def ann_recall(spark, sf: str, n_queries: int = 20, k: int = 5) -> dict:
    exact = _topk_sets(S.ann_bruteforce_topk(spark, sf, n_queries=n_queries, k=k))
    out: dict = {"n_queries": n_queries, "k": k, "lsh": {}, "ivf": {}}
    for n_tables in (1, 2, 4):
        approx = _topk_sets(
            S.ann_lsh_bucketed(spark, sf, n_queries=n_queries, k=k, n_tables=n_tables)
        )
        out["lsh"][f"n_tables={n_tables}"] = _recall_at_k(approx, exact)
    for n_probe in (1, 2, 4):
        approx = _topk_sets(
            S.ann_ivf_probe(spark, sf, n_queries=n_queries, k=k, n_probe=n_probe)
        )
        out["ivf"][f"n_probe={n_probe}"] = _recall_at_k(approx, exact)
    out["ivf"]["n_probe=2,kmeans_iters=3"] = _recall_at_k(
        _topk_sets(
            S.ann_ivf_probe(spark, sf, n_queries=n_queries, k=k, n_probe=2, kmeans_iters=3)
        ),
        exact,
    )
    # IVF-PQ: per n_probe (cell-coverage loss) plus a full-probe row that
    # isolates the PQ/ADC shortlist loss alone
    out["ivf_pq"] = {}
    for n_probe in (2, 4, 8):
        approx = _topk_sets(
            S.ann_ivf_pq(spark, sf, n_queries=n_queries, k=k, n_probe=n_probe)
        )
        out["ivf_pq"][f"n_probe={n_probe}"] = _recall_at_k(approx, exact)
    out["ivf_pq"]["n_probe=8,refine=8"] = _recall_at_k(
        _topk_sets(S.ann_ivf_pq(spark, sf, n_queries=n_queries, k=k, n_probe=8, refine=8)),
        exact,
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs-sf", default="/root/testdata/sf0.001",
                    help="sf dir for the O(n^2) exact-pair ground truths")
    ap.add_argument("--ann-sf", default="/root/testdata/sf0.01",
                    help="sf dir for ANN recall@k")
    args = ap.parse_args()
    spark = get_spark(master="local[32]", shuffle_partitions=32)

    res = {
        "pairs_sf": args.pairs_sf,
        "ann_sf": args.ann_sf,
        "minhash_lsh": minhash_recall(spark, args.pairs_sf),
        "simhash_pairs": simhash_recall(spark, args.pairs_sf),
        "banding_curve_measured": banding_curve_measured(spark, args.pairs_sf),
        "ann": ann_recall(spark, args.ann_sf),
    }
    print(json.dumps(res))
    m = res["minhash_lsh"]
    print(
        "banding curve (measured vs analytic per J decile):\n  "
        + "\n  ".join(
            f"{k}: n={v['n']} measured={v['measured']} analytic={v['analytic']}"
            for k, v in res["banding_curve_measured"].items()
        )
        + "\n"
        f"minhash: {m['found_pairs']}/{m['truth_pairs']} recall={m['recall']}\n"
        f"simhash: recall={res['simhash_pairs']['recall']} "
        f"({res['simhash_pairs']['truth_pairs']} truth pairs)\n"
        f"ann lsh: {res['ann']['lsh']}\nann ivf: {res['ann']['ivf']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
