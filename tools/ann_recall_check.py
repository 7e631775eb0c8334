"""Measure recall@5 of the registered ANN operators (sm03/sm05/sm06)
against brute-force ground truth. Usage: python tools/ann_recall_check.py [sf_dir]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyconnect_spark.catalog import load_table
from pyconnect_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = 5
N_QUERIES = 5


def ground_truth(spark):
    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    truth = {}
    for q in range(N_QUERIES):
        qi = int(np.where(ids == q)[0][0])
        sims = mat @ mat[qi]
        sims[qi] = -2
        truth[q] = set(int(x) for x in ids[np.argsort(-sims)[:K]])
    return truth, len(ids)


def main():
    spark = get_spark("ann-recall", cores="8")
    spark.sparkContext.setLogLevel("ERROR")
    truth, n_corpus = ground_truth(spark)
    from pyconnect_spark.registry import ALL

    builders = ALL.builders()
    for name in ("sm03_ann_lsh", "sm05_ann_ivf", "sm06_ann_mllib_lsh"):
        t0 = time.time()
        df = builders[name](spark, SF)
        got = {}
        for r in df.collect():
            got.setdefault(r["q_id"], set()).add(r["vec_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        cand = sum(len(v) for v in got.values())
        print(
            f"{name:22s} recall@5={hits/(K*len(truth)):.2f}  rows={cand}  "
            f"corpus={n_corpus}  {time.time()-t0:.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
