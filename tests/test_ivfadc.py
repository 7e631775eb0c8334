"""IVFADC (sm18) quality + construction pins.

The round-5 verdict's bar: residual encoding (the real FAISS IndexIVFPQ
construction — PQ codes quantize x - centroid[cell], not raw vectors) and
recall@5 >= 0.8 demonstrated on a fixture WITH structure (the parquet
embeddings are i.i.d. Gaussian — the published worst case for the IVF
family, where no coarse quantizer captures anything)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyconnect_spark.operators.similarity import (
    clustered_embeddings,
    ivf_seed_frame,
    ivfadc_topk,
    pq_adc_topk,
    pq_best_codes,
    seed_ivf_cells_frame,
)


@pytest.fixture(scope="module")
def clustered(spark):
    return clustered_embeddings(spark, n=512).cache()


def _truth(rows, k=5, nq=5):
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    truth = {}
    for q in range(nq):
        qi = int(np.where(ids == q)[0][0])
        sims = mat @ mat[qi]
        sims[qi] = -2
        truth[q] = set(int(x) for x in ids[np.argsort(-sims)[:k]])
    return truth


def test_clustered_recall_at_5_is_production_shaped(spark, clustered):
    truth = _truth(clustered.collect())
    got: dict[int, set] = {}
    for r in ivfadc_topk(clustered, math.ceil(math.sqrt(512)), n_codes=256).collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    recall = sum(len(got.get(q, set()) & t) for q, t in truth.items()) / 25.0
    assert recall >= 0.8, f"clustered IVFADC recall@5 = {recall}"


def test_pq_adc_clustered_recall(spark, clustered):
    # round-6 verdict task #5: sm17's PQ-ADC consumer must also show its
    # merit on data with structure — measured 1.0 on the clustered
    # fixture (vs 0.76 on the i.i.d.-Gaussian parquet worst case),
    # pinned >= 0.9; bench tracks it per-run as sm17_pq_adc_clustered
    truth = _truth(clustered.collect())
    got: dict[int, set] = {}
    for r in pq_adc_topk(clustered, n_codes=256).collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    recall = sum(len(got.get(q, set()) & t) for q, t in truth.items()) / 25.0
    assert recall >= 0.9, f"clustered PQ-ADC recall@5 = {recall}"


def test_codes_are_residual_encoded(spark, clustered):
    # on a tightly clustered corpus, raw vectors of ONE cluster share
    # nearly identical PQ codes (they all sit at the cluster center), so
    # raw encoding collapses code diversity; residual encoding spreads it.
    # Pin the construction: residual code tables must distinguish vectors
    # within the same cell far better than raw encoding does.
    n_cells = math.ceil(math.sqrt(512))
    cells = (
        seed_ivf_cells_frame(clustered, n_cells)
        .filter(F.col("rk") == 1)
        .select("vec_id", "cell")
    )
    cents = ivf_seed_frame(clustered, n_cells).select(
        F.col("srk").alias("cell"),
        F.transform("seed_emb", lambda x: x.cast("double")).alias("cent"),
    )
    resid = (
        clustered.join(cells, "vec_id")
        .join(F.broadcast(cents), "cell")
        .select(
            "vec_id",
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                F.col("cent"),
                lambda a, b: a - b,
            ).alias("embedding"),
        )
    )

    def n_distinct_code_words(frame, salt=""):
        codes = pq_best_codes(frame, salt=salt).groupBy("vec_id").agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "k"))),
                    lambda s: s["k"].cast("string"),
                ),
            ).alias("code")
        )
        return codes.select("code").distinct().count()

    raw = n_distinct_code_words(clustered)
    res = n_distinct_code_words(resid, salt=":pq")
    assert res > raw, (raw, res)
    # and the salt itself is load-bearing: without it the PQ seeds ARE the
    # cell centroids, every codeword is the zero residual, and the code
    # table degenerates to a single code
    assert n_distinct_code_words(resid) == 1


def test_ivfadc_plan_is_scale_shaped(spark, clustered):
    from pyconnect_spark.plans import unpartitioned_windows

    df = ivfadc_topk(clustered, math.ceil(math.sqrt(512)), n_codes=256)
    assert unpartitioned_windows(df) == []
