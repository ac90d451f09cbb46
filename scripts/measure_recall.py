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
        "ann": ann_recall(spark, args.ann_sf),
    }
    print(json.dumps(res))
    m = res["minhash_lsh"]
    print(
        f"minhash: {m['found_pairs']}/{m['truth_pairs']} recall={m['recall']}\n"
        f"simhash: recall={res['simhash_pairs']['recall']} "
        f"({res['simhash_pairs']['truth_pairs']} truth pairs)\n"
        f"ann lsh: {res['ann']['lsh']}\nann ivf: {res['ann']['ivf']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
