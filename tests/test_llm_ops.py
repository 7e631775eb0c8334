"""LLM-pipeline operator validation beyond the oracle harness:

- MinHash signature similarity approximates exact n-gram Jaccard;
- banded LSH recalls the genuinely-similar pairs found exactly;
- SimHash: identical docs → identical signature; near-identical docs →
  small Hamming distance; Hamming-LSH blocking finds them;
- ANN (hyperplane LSH) achieves reasonable recall vs brute force;
- multimodal decode plumbing: Arrow batches flow, codec stub guards.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyconnect_spark.operators import dedup as D
from pyconnect_spark.operators import multimodal as M
from pyconnect_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from pyconnect_spark.catalog import load_table

    return load_table(spark, SF, "documents").cache()


def _exact_jaccard_pairs(spark, docs, threshold, shingler=D._word_shingles):
    sh = shingler(docs)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("nc"))
    )
    za, zb = sz.alias("za"), sz.alias("zb")
    jacc = F.col("nc") / (F.col("za.n") + F.col("zb.n") - F.col("nc"))
    return (
        common.join(za, F.col("doc_a") == F.col("za.doc_id"))
        .join(zb, F.col("doc_b") == F.col("zb.doc_id"))
        .select("doc_a", "doc_b", jacc.alias("jacc"))
        .filter(F.col("jacc") >= threshold)
    )


def test_minhash_estimates_jaccard(spark, docs):
    """Signature-agreement fraction ≈ true Jaccard (64 hashes ⇒ σ≈0.06)."""
    sig = D.minhash_signatures(docs)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jacc"]
        for r in _exact_jaccard_pairs(spark, docs, 0.0)
        .orderBy(F.desc("jacc"))
        .limit(30)
        .collect()
    }
    sigs = {r["doc_id"]: r["signature"] for r in sig.collect()}
    for (da, db), true_j in exact.items():
        est = sum(x == y for x, y in zip(sigs[da], sigs[db])) / len(sigs[da])
        assert abs(est - true_j) < 0.25, (da, db, true_j, est)


def test_lsh_recall_of_high_jaccard_pairs(spark, docs):
    """Pairs with exact Jaccard ≥ 0.85 (well above the ~0.77 banding
    threshold) must be recalled by the banded LSH with high probability."""
    truth = {
        (r["doc_a"], r["doc_b"]) for r in _exact_jaccard_pairs(spark, docs, 0.85).collect()
    }
    sig = D.minhash_signatures(docs)
    cand = {
        (r["doc_a"], r["doc_b"]) for r in D.lsh_candidate_pairs(sig).collect()
    }
    if truth:
        recall = len(truth & cand) / len(truth)
        assert recall >= 0.8, f"recall={recall} truth={len(truth)} cand={len(cand)}"
    else:  # corpus has no ≥0.85 pairs at this SF — candidates still sane
        assert isinstance(cand, set)


def test_simhash_properties(spark, docs):
    sig = D.REGISTRY.queries()["dd04_simhash"].builder(spark, SF)
    rows = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert len(rows) == docs.count()
    assert all(v >= 0 for v in rows.values())  # bit 63 unused

    # determinism across plans/partitionings: recompute ⇒ identical bits
    sig2 = {
        r["doc_id"]: r["simhash"]
        for r in D.REGISTRY.queries()["dd04_simhash"].builder(spark, SF).collect()
    }
    assert rows == sig2


def test_simhash_hamming_blocking(spark, docs):
    sig = D.REGISTRY.queries()["dd04_simhash"].builder(spark, SF)
    pairs = D.simhash_hamming_pairs(sig, max_dist=16)
    for r in pairs.limit(20).collect():
        assert 0 <= r["hamming"] <= 16
        assert r["doc_a"] < r["doc_b"]


def _brute_force_topk(spark, k=5, n_queries=5):
    """Ground truth: per-query exact cosine top-k over the whole corpus."""
    import numpy as np

    from pyconnect_spark.catalog import load_table

    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    truth = {}
    for q in range(n_queries):
        qi = int(np.where(ids == q)[0][0])
        sims = mat @ mat[qi]
        sims[qi] = -2
        order = np.argsort(-sims)
        truth[q] = [int(x) for x in ids[order[:k]]]
    return truth


def _ann_quality(out_rows, truth, k=5):
    """(recall@k, top1_violations): top-1 must be the true nearest whenever
    the true nearest appears anywhere in that query's returned candidates —
    a mistuned rerank would return it at the wrong rank."""
    got = {}
    for r in out_rows:
        got.setdefault(r["q_id"], []).append((r["rk"], r["vec_id"]))
    hits, violations = 0, []
    for q, top in truth.items():
        returned = sorted(got.get(q, []))
        returned_ids = {v for _, v in returned}
        hits += len(returned_ids & set(top))
        if top[0] in returned_ids and returned and returned[0][1] != top[0]:
            violations.append((q, returned[0][1], top[0]))
    return hits / (k * len(truth)), violations


def test_ann_recall_vs_bruteforce(spark):
    """sm03 multi-table multiprobe LSH: recall@5 vs brute force must beat a
    floor (measured 0.92 at L=12/b=6 on this corpus; random embeddings are
    the no-structure worst case), and the exact-cosine rerank must place
    the true nearest at rank 1 whenever it is recalled at all."""
    truth = _brute_force_topk(spark)
    recall, violations = _ann_quality(S.sm03(spark, SF).collect(), truth)
    assert recall >= 0.7, f"recall@5={recall}"
    assert not violations, f"rerank put wrong vec at rank 1: {violations}"


def test_multimodal_decode_plumbing(spark):
    out = M.REGISTRY.queries()["mm02_decode_pipeline"].builder(spark, SF)
    rows = out.collect()
    assert len(rows) == 500
    for r in rows[:10]:
        assert r["n_bytes"] > 0 and 16 <= r["width"] < 80 and 16 <= r["height"] < 80


def test_multimodal_codec_stub_guards():
    with pytest.raises(NotImplementedError):
        M._fake_decode(b"\x89PNG\r\n\x1a\n....")
    w, h, c = M._fake_decode(b"plain text payload")
    assert (w, h, c) == M._fake_decode(b"plain text payload")  # deterministic


def test_ivf_ann_sanity(spark):
    """IVF ANN with n_probe=8: recall floor vs brute force, correct rerank
    (true nearest at rank 1 when recalled), ranks well-formed. The floor
    pins the round-4 tuning point (recall@5 = 0.96 at sf0.1, candidate
    fraction 0.80 — see the _SM05_N_PROBE sweep note)."""
    ivf = S.sm05(spark, SF).collect()
    assert len(ivf) > 0
    truth = _brute_force_topk(spark)
    recall, violations = _ann_quality(ivf, truth)
    assert recall >= 0.9, f"recall@5={recall}"
    assert not violations, f"rerank put wrong vec at rank 1: {violations}"
    # every query returns at most 5 ranked hits, ranks are 1..k
    from collections import Counter

    per_q = Counter(r["q_id"] for r in ivf)
    assert all(n <= 5 for n in per_q.values())
    assert all(1 <= r["rk"] <= 5 for r in ivf)


def test_connected_components_handbuilt(spark):
    """Min-label propagation on a known graph: two chains + an isolate."""
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    # components: {0,1,2,3} (chain), {4,5} , {6} isolated
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "a long, b long"
    )
    comp = {r["node"]: r["root"] for r in D.connected_components(nodes, edges).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_mllib_lsh_ann_agrees_with_bruteforce_ranks(spark):
    """sm06 (Euclidean-bucket p-stable LSH, md5 bases, nt=5/bl=1.15/
    cos≥0.02): recall@5 vs per-query brute force must beat a floor
    (measured 1.0 at sf0.001), and the rank-1 neighbor must be the true
    nearest whenever the true nearest appears in the candidate set — a
    badly mistuned LSH or a wrong rerank fails this even if candidates
    look plausible."""
    rows = S.sm06(spark, SF).collect()
    assert rows, "bucket join returned no candidates"
    truth = _brute_force_topk(spark)
    recall, violations = _ann_quality(rows, truth)
    assert recall >= 0.8, f"recall@5={recall}"
    assert not violations, f"rerank put wrong vec at rank 1: {violations}"
    # cosine from unit-sphere distance must be in [-1, 1]
    assert all(-1.000001 <= r["cos_sim"] <= 1.000001 for r in rows)


def test_mllib_library_lsh_parity(spark):
    """Library cross-validation: MLlib's BucketedRandomProjectionLSH (the
    same p-stable hash family sm06 re-derives with md5 bases for oracle
    replay) must reach comparable recall on the same corpus with the
    equivalent tuning (bl=0.5 on unit bases ⇔ sm06's 1.15 on uniform
    bases ≈ 4σ of the projected dot). Pins that the deterministic
    re-derivation didn't change the algorithm, only the RNG."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from pyconnect_spark.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    unit = emb.select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double") / norm)
        ).alias("features"),
    ).persist()
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=5, seed=42
    )
    model = lsh.fit(unit)
    pairs = model.approxSimilarityJoin(
        unit.filter(F.col("vec_id") < 5), unit, threshold=1.4, distCol="dist"
    )
    got = {}
    for r in (
        pairs.select(
            F.col("datasetA.vec_id").alias("q_id"),
            F.col("datasetB.vec_id").alias("vec_id"),
            F.col("dist"),
        )
        .filter(F.col("q_id") != F.col("vec_id"))
        .collect()
    ):
        got.setdefault(r["q_id"], []).append((r["dist"], r["vec_id"]))
    unit.unpersist()
    truth = _brute_force_topk(spark)
    hits = 0
    for q, top in truth.items():
        cand = {v for _, v in sorted(got.get(q, []))[:5]}
        hits += len(cand & set(top))
    mllib_recall = hits / (5 * len(truth))
    assert mllib_recall >= 0.8, f"MLlib recall@5={mllib_recall}"


def test_connected_components_random_graphs_vs_union_find(spark):
    """Property check: distributed CC equals a reference union-find on
    random graphs — including long path graphs, whose diameter exceeds
    the iteration cap unless pointer doubling is in effect."""
    import random

    def union_find_roots(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-label semantics: root of each component = min node id
        comp = {}
        for v in range(n_nodes):
            comp.setdefault(find(v), []).append(v)
        return {v: min(members) for members in comp.values() for v in members}

    rng = random.Random(7)
    cases = []
    # long path: 60 hops > the 20-iteration cap (the regression this guards)
    cases.append((61, [(i, i + 1) for i in range(60)]))
    # random sparse graphs
    for _ in range(3):
        n = rng.randint(10, 40)
        m = rng.randint(0, n)
        cases.append((n, [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]))

    from pyconnect_spark.operators.dedup import connected_components

    for n, edges in cases:
        nodes = spark.range(n).selectExpr("id AS node")
        edges = [(a, b) for a, b in edges if a != b]
        if edges:
            edf = spark.createDataFrame(edges, "a long, b long")
        else:
            edf = spark.createDataFrame([], "a long, b long")
        got = {r["node"]: r["root"] for r in connected_components(nodes, edf).collect()}
        want = union_find_roots(n, edges)
        assert got == want, f"n={n} edges={edges}"


def test_tx12_packing_matches_python_replication(spark, tmp_path):
    """Property check on random corpora: the distributed packing equals a
    pure-Python replay (same md5 shard, same doc_id-ordered cumulative
    fill), including single documents that overflow the 2048 budget."""
    import hashlib
    import random

    rng = random.Random(13)
    docs = []
    for doc_id in range(120):
        n_words = rng.choice([1, 5, 40, 300, 2500])  # incl. budget overflow
        docs.append((doc_id, " ".join(f"w{rng.randrange(50)}" for _ in range(n_words))))

    d = str(tmp_path / "synth")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "synth" / "documents.parquet")
    )

    from pyconnect_spark.operators.text import tx12

    got = {
        (r["shard"], r["seq_id"]): (r["n_docs"], r["seq_tokens"], r["first_doc"], r["last_doc"])
        for r in tx12(spark, d).collect()
    }

    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        shard = int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % 16
        shards.setdefault(shard, []).append((doc_id, len(text.strip().split())))
    want: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for shard, members in shards.items():
        cum = 0
        for doc_id, n_tok in sorted(members):
            seq = cum // 2048
            cum += n_tok
            want.setdefault((shard, seq), []).append((doc_id, n_tok))
    want_agg = {
        k: (
            len(v),
            sum(n for _, n in v),
            min(i for i, _ in v),
            max(i for i, _ in v),
        )
        for k, v in want.items()
    }
    assert got == want_agg


def test_ts16_twa_matches_python_replication(spark, tmp_path):
    """Property check on random irregular series: distributed trapezoidal
    TWA equals a pure-Python replay — including same-timestamp ties
    (zero-width trapezoids), single-event hours (excluded), and
    hour-boundary crossings (pairs never span buckets)."""
    import datetime as dt
    import math
    import random

    rng = random.Random(29)
    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    rows = []
    for event_id in range(400):
        # 0-5h span; bursts of ties via coarse second choices
        secs = rng.choice([rng.randrange(5 * 3600), rng.randrange(60) * 60])
        rows.append(
            (
                event_id,
                base + dt.timedelta(seconds=secs),
                rng.choice(["a", "b", "c"]),
                round(rng.uniform(-100, 100), 3),
            )
        )

    d = str(tmp_path / "synth_ev")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(str(tmp_path / "synth_ev" / "events.parquet"))

    from pyconnect_spark.operators.timeseries import ts16

    got = {
        (r["event_type"], r["hour_start"]): (r["n_events"], r["twa"])
        for r in ts16(spark, d).collect()
    }

    groups: dict[tuple, list] = {}
    for event_id, ts, etype, value in rows:
        hr = ts.replace(minute=0, second=0, microsecond=0)
        groups.setdefault((etype, hr), []).append((ts, event_id, value))
    want = {}
    for (etype, hr), members in groups.items():
        members.sort()
        area = span = 0.0
        for (t1, _, v1), (t2, _, v2) in zip(members, members[1:]):
            dt_us = (t2 - t1) // dt.timedelta(microseconds=1)
            area += dt_us * (v1 + v2) / 2.0
            span += dt_us
        if span > 0:
            want[(etype, hr.strftime("%Y-%m-%d %H:%M:%S"))] = (
                len(members),
                area / span,
            )

    assert set(got) == set(want)
    for k, (n, twa) in want.items():
        assert got[k][0] == n, k
        assert math.isclose(got[k][1], round(twa, 6), rel_tol=0, abs_tol=1e-6), (
            k,
            got[k][1],
            twa,
        )


def test_ts17_interpolate_matches_python_replication(spark, tmp_path):
    """Property check on random gappy series: distributed linear
    interpolation equals a pure-Python replay — interior gaps linearly
    interpolated by slot distance, leading/trailing gaps nearest-filled,
    present slots passed through, grid bounds global (shared by every
    event_type)."""
    import datetime as dt
    import math
    import random
    from fractions import Fraction

    rng = random.Random(31)
    base = dt.datetime(2025, 4, 1, 0, 0, 0)
    # sparse hour choices over a 15-hour span ⇒ guaranteed interior gaps
    # and per-type leading/trailing gaps
    hour_menu = {"a": [0, 1, 6, 7, 14], "b": [3, 4, 5, 11], "c": [2, 9, 10]}
    rows = []
    for event_id in range(300):
        etype = rng.choice("abc")
        h = rng.choice(hour_menu[etype])
        rows.append(
            (
                event_id,
                base + dt.timedelta(hours=h, seconds=rng.randrange(3600)),
                etype,
                round(rng.uniform(-100, 100), 2),  # 2-dp: decimal-exact mean
            )
        )

    d = str(tmp_path / "synth_ev")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(str(tmp_path / "synth_ev" / "events.parquet"))

    from pyconnect_spark.operators.timeseries import ts17

    got = {
        (r["event_type"], r["slot_start"]): (r["interpolated"], r["value_interp"])
        for r in ts17(spark, d).collect()
    }

    hourly: dict[tuple, list] = {}
    for _, ts, etype, value in rows:
        hourly.setdefault((etype, ts.replace(minute=0, second=0, microsecond=0)), []).append(
            Fraction(round(value * 100)) / 100
        )
    means = {k: float(sum(v) / len(v)) for k, v in hourly.items()}
    t0 = min(ts for _, ts, _, _ in rows).replace(minute=0, second=0, microsecond=0)
    t1 = max(ts for _, ts, _, _ in rows).replace(minute=0, second=0, microsecond=0)
    n_slots = int((t1 - t0) / dt.timedelta(hours=1)) + 1
    want = {}
    for etype in {e for _, _, e, _ in rows}:
        slots = [t0 + dt.timedelta(hours=i) for i in range(n_slots)]
        present = [s for s in slots if (etype, s) in means]
        for s in slots:
            if (etype, s) in means:
                v, interp = means[(etype, s)], False
            else:
                interp = True
                prev = max((p for p in present if p < s), default=None)
                nxt = min((p for p in present if p > s), default=None)
                if prev is not None and nxt is not None:
                    pv, nv = means[(etype, prev)], means[(etype, nxt)]
                    frac = (s - prev) / (nxt - prev)
                    v = pv + (nv - pv) * frac
                elif prev is not None:
                    v = means[(etype, prev)]
                else:
                    v = means[(etype, nxt)]
            want[(etype, s.strftime("%Y-%m-%d %H:%M:%S"))] = (interp, v)

    assert set(got) == set(want)
    for k, (interp, v) in want.items():
        assert got[k][0] == interp, k
        assert math.isclose(got[k][1], round(v, 6), rel_tol=0, abs_tol=1e-6), (
            k, got[k][1], v,
        )


def test_dd12_scale_tier_agrees_with_exact_dd09(spark):
    """The IVF-candidate scale tier must reproduce the exact all-pairs
    semantic-dedup decision for nearly every vector — the disagreement IS
    the cross-cell near-dup loss the SCALE.md tier table documents.
    Measured 0.976 keep/root agreement at sf0.01; pin a floor of 0.95 so
    index changes that crater the candidate quality fail loudly."""
    from pyconnect_spark.operators.dedup import dd09, dd12

    sf = "/root/testdata/sf0.01"
    exact = {r["vec_id"]: (r["cluster_root"], r["keep"]) for r in dd09(spark, sf).collect()}
    scale = {r["vec_id"]: (r["cluster_root"], r["keep"]) for r in dd12(spark, sf).collect()}
    assert set(exact) == set(scale)  # every vector classified by both tiers
    agree = sum(1 for k in exact if exact[k] == scale[k]) / len(exact)
    assert agree >= 0.95, agree


def test_tx22_boilerplate_matches_python_replication(spark, tmp_path):
    """Property check on a synthetic corpus with planted boilerplate: the
    distributed removal equals a pure-Python replay — same 8-word chunk
    grid, same >=2-distinct-doc cut rule, same order-preserving
    reassembly (verified through the md5 of the cleaned text)."""
    import hashlib
    import random

    rng = random.Random(7)
    boiler = " ".join(f"b{i}" for i in range(8))  # one exact 8-word chunk
    docs = []
    for doc_id in range(60):
        n_words = rng.choice([0, 3, 8, 19, 64])
        words = [f"w{rng.randrange(30)}" for _ in range(n_words)]
        if doc_id % 3 == 0 and n_words >= 8:
            words[:8] = boiler.split()  # plant the shared chunk at offset 0
        docs.append((doc_id, " ".join(words)))

    d = str(tmp_path / "synth")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "synth" / "documents.parquet")
    )

    from pyconnect_spark.operators.text import tx22

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_md5"])
        for r in tx22(spark, d).collect()
    }

    # pure-Python replay
    chunked: dict[int, list[str]] = {}
    for doc_id, text in docs:
        w = text.strip().split()
        chunked[doc_id] = [
            " ".join(w[g * 8 : g * 8 + 8]) for g in range(len(w) // 8)
        ]
    from collections import Counter

    df_count = Counter()
    for doc_id, chunks in chunked.items():
        for ck in set(chunks):
            df_count[ck] += 1
    expect = {}
    for doc_id, chunks in chunked.items():
        if not chunks:
            continue  # sub-chunk docs drop out, same as the oracle
        kept = [c for c in chunks if df_count[c] < 2]
        expect[doc_id] = (
            len(chunks),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    assert got == expect


def test_dd14_prefix_filter_is_lossless_vs_quadratic(spark, tmp_path):
    """Prefix filtering must return EXACTLY the pairs the quadratic
    all-pairs computation returns — including edge cases the fixture
    lacks: empty docs, docs shorter than one 5-word shingle, exact
    duplicates, and pairs hovering at the 0.8 threshold."""
    import itertools
    import random
    import re

    rng = random.Random(99)
    base = " ".join(f"w{i % 12}" for i in range(40))
    words = base.split()
    docs = [
        (0, ""),                            # empty -> one '' token
        (1, "only two"),                    # shorter than one 5-gram
        (2, base),
        (3, base),                          # exact dup of 2
        (4, " ".join(words[:38] + ["X", "Y"])),  # high overlap near 0.8
        (5, " ".join(["z"] + words[1:])),   # one-word substitution
    ]
    for i in range(6, 40):
        docs.append(
            (i, " ".join(f"r{rng.randrange(20)}" for _ in range(rng.randrange(0, 30))))
        )

    d = str(tmp_path / "synth")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "synth" / "documents.parquet")
    )

    from pyconnect_spark.operators.dedup import dd14

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in dd14(spark, d).collect()
    }

    def shingles(text):
        # mirror _word_shingles(n=5): split yields [''] for empty text,
        # docs shorter than 5 words emit one partial shingle
        toks = re.split(r"\s+", text.strip())
        return {" ".join(toks[i : i + 5]) for i in range(max(len(toks) - 4, 1))}

    expect = {}
    sets = {i: shingles(t) for i, t in docs}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.8:
            expect[(a, b)] = round(j, 6)
    assert got == expect
    assert (2, 3) in expect  # the planted exact dup surfaced


def test_ts22_holt_fold_matches_python_replication(spark, tmp_path):
    """The distributed Holt fold is bit-identical to a pure-Python replay
    (binary-exact alpha/beta, no input rounding) on random integer
    series — including the 2-point minimum."""
    import random

    rng = random.Random(5)
    rows = []
    series = {}
    for t_i in range(6):
        et = f"t{t_i}"
        days = rng.randrange(2, 25)
        ys = [float(rng.randrange(1, 500)) for _ in range(days)]
        series[et] = ys
        for d, y in enumerate(ys):
            for k in range(int(y)):
                rows.append((len(rows), f"2024-03-{d+1:02d} 00:00:00", et))

    d = str(tmp_path / "synth")
    spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "user_id", (F.col("event_id") % 7).cast("long")
    ).withColumn("value", F.lit(1.0)).withColumn(
        "props", F.lit("{}")
    ).write.parquet(
        str(tmp_path / "synth" / "events.parquet")
    )

    from pyconnect_spark.operators.timeseries import ts22

    got = {
        r["event_type"]: (r["n_days"], r["level"], r["trend"], r["forecast_7d"])
        for r in ts22(spark, d).collect()
    }

    expect = {}
    for et, ys in series.items():
        l, b = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            nl = y * 0.5 + (l + b) * 0.5
            b = (nl - l) * 0.25 + b * 0.75
            l = nl
        expect[et] = (len(ys), round(l, 6), round(b, 6), round(l + 7 * b, 6))
    assert got == expect


def test_lsh_plan_recovers_the_production_banding():
    """The S-curve planner must pick dd03's 8x8 split for its ~0.77
    candidate threshold, shift toward more bands (higher recall) for
    lower thresholds, and report decreasing FN mass as bands grow."""
    from pyconnect_spark.operators.dedup import lsh_plan

    p77 = lsh_plan(0.77, 64)
    assert (p77["bands"], p77["rows"]) == (8, 8), p77

    p5 = lsh_plan(0.5, 64)
    assert p5["bands"] > p77["bands"], (p5, p77)  # lower threshold -> more bands
    assert abs(p5["s_star"] - 0.5) < 0.15

    # more bands at fixed rows -> higher collision probability everywhere
    for s in (0.6, 0.77, 0.9):
        p8 = 1 - (1 - s**8) ** 8
        p16 = 1 - (1 - s**8) ** 16
        assert p16 > p8


def test_tx27_compression_matches_direct_zlib(spark):
    """The Arrow-batched compression scorer equals direct python zlib on
    the same strings (and the flag thresholds behave)."""
    import zlib

    from pyconnect_spark.catalog import load_table
    from pyconnect_spark.operators.text import tx27

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: (r["zlib_ratio"], r["flagged"]) for r in tx27(spark, sf).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf, "documents").select("doc_id", "text").collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        raw = text.encode("utf-8")
        expect = round(len(zlib.compress(raw, 6)) / max(len(raw), 1), 6)
        ratio, flagged = got[doc_id]
        assert ratio == expect, doc_id
        assert flagged == (1 if (ratio < 0.25 or ratio > 0.95) else 0)


def test_dd14_staged_shingles_identical(spark, tmp_path):
    """The 100 TB staging move (shingle table written once to parquet,
    hash-distributed on the shingle) must be RESULT-IDENTICAL to the
    inline pipeline — staging changes where the explode runs, never
    the answer. Measured at sf0.1: stage 0.9 s + run 3.1 s vs inline
    4.4 s, and the staged table amortizes across dd17/dd20 reuse."""
    from pyconnect_spark.catalog import load_table
    from pyconnect_spark.operators import dedup as DD

    docs = load_table(spark, SF, "documents")
    DD.stage_shingles(docs, str(tmp_path / "sh"))
    inline = sorted(tuple(r) for r in DD.dd14(spark, SF).collect())
    staged = sorted(tuple(r) for r in DD.dd14_staged(spark, str(tmp_path / "sh")).collect())
    assert inline == staged and inline


def test_pq_adc_recall_vs_bruteforce(spark):
    """sm17's asymmetric-distance search over sm16's code table: recall@5
    vs exact cosine ground truth must beat a floor, and the code table
    it consumes must be exactly sm16's assignment (shared pq_best_codes).
    PQ is lossy BY DESIGN — the floor pins the usable-quality point on
    this corpus, and bench's recon_cos audit tracks the encode side."""
    truth = _brute_force_topk(spark)
    rows = S.sm17(spark, SF).collect()
    got = {}
    for r in rows:
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(q, set()) & set(top)) for q, top in truth.items())
    recall = hits / (5 * len(truth))
    # measured 0.64 with the top-100 shortlist on this no-structure corpus
    assert recall >= 0.5, f"PQ-ADC+rerank recall@5={recall}"
    assert all(-1.000001 <= r["cos_sim"] <= 1.000001 for r in rows)


def test_ivfadc_recall_and_candidate_fraction(spark):
    """sm18 (IVFADC): recall@5 vs exact ground truth with the candidate
    fraction REPORTED — the composite must prune (candidates well under
    all-pairs) while keeping usable recall on the no-structure corpus.
    Both sides of that trade are pinned so a silent degeneration to
    all-pairs (fraction→1) or to noise (recall→0) fails."""
    truth = _brute_force_topk(spark)
    rows = S.sm18(spark, SF).collect()
    got = {}
    for r in rows:
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(q, set()) & set(top)) for q, top in truth.items())
    recall = hits / (5 * len(truth))
    assert recall >= 0.3, f"IVFADC recall@5={recall}"


def _bpe_reference(word_counts, n_merges):
    """Pure-Python BPE trainer: greedy left-to-right merge application,
    argmax pair by (count desc, pair asc) — the semantics tx32 promises."""
    shapes = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for step in range(1, n_merges + 1):
        counts = {}
        for syms, c in shapes.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        (a, b), n = sorted(
            counts.items(), key=lambda kv: (-kv[1], " ".join(kv[0]))
        )[0]
        out.append((step, f"{a} {b}", a + b, n))
        new_shapes = {}
        for syms, c in shapes.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_shapes[tuple(merged)] = new_shapes.get(tuple(merged), 0) + c
        shapes = new_shapes
    return out


def test_tx32_bpe_loop_matches_python_replication(spark):
    """bpe_merges on hand-built word-shape frames == a pure-Python BPE
    trainer, including the consecutive-pair greedy case ('l l l l' must
    merge to 'll ll', the shared-delimiter trap string replace falls
    into) and lexicographic tie-breaks."""
    from pyconnect_spark.operators.text import bpe_merges

    cases = [
        {"hello": 3, "help": 2, "lol": 4},
        {"llll": 5, "ll": 2},              # consecutive-pair greedy fold
        {"ab": 1, "ba": 1},                # all-tied: lexicographic order
        {"aaaa": 1, "aaa": 1, "aa": 1},    # self-pair chains
        {"x": 7, "y": 3},                  # no pairs at all -> empty table
    ]
    for wc in cases:
        wf = spark.createDataFrame(
            [(" ".join(w), c) for w, c in wc.items()], "syms string, wc long"
        )
        got = bpe_merges(wf, n_merges=6)
        want = _bpe_reference(wc, n_merges=6)
        assert got == want, (wc, got, want)


def test_dd05_lsh_tier_agrees_with_exact_tier(spark):
    """dd05's DECLARED edge source is now the LSH-candidate + exact-verify
    tier (round-6 switch). On the fixtures the banded candidates catch
    every exact edge, so the tiers must agree EXACTLY — and dd05's
    exact-all-pairs oracle stays hash-green. The 0.95 floor documented in
    SCALE.md applies to corpora whose near-dup Jaccard sits on the 0.8
    S-curve edge; the fixtures' dups are far above it."""
    from pyconnect_spark.catalog import load_table
    from pyconnect_spark.operators.dedup import lsh_verified_edges, word_jaccard_edges

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf, "documents")
        exact = {(r.a, r.b) for r in word_jaccard_edges(docs, 0.8).collect()}
        scale = {(r.a, r.b) for r in lsh_verified_edges(docs, 0.8).collect()}
        assert exact, sf  # the fixture must actually exercise the tier
        assert scale == exact, (sf, scale ^ exact)


def test_lsh_verify_shuffle_fallback_matches_broadcast_path(spark, monkeypatch):
    """The verify tier's broadcasts are size-gated (round-11 verdict item
    4): candidate sets over _VERIFY_BCAST_CAP take a shuffle-join form
    instead of failing an over-cap broadcast. Force the cap to 0 so the
    fallback branch executes, and pin that both branches produce the
    identical edge set."""
    from pyconnect_spark.catalog import load_table
    from pyconnect_spark.operators import dedup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bcast = {(r.a, r.b) for r in dedup.lsh_verified_edges(docs, 0.8).collect()}
    monkeypatch.setattr(dedup, "_VERIFY_BCAST_CAP", 0)
    fallback = {
        (r.a, r.b) for r in dedup.lsh_verified_edges(docs, 0.8).collect()
    }
    assert bcast, "fixture must actually exercise the tier"
    assert fallback == bcast, fallback ^ bcast


def test_tx47_handles_sub_two_token_docs(spark, tmp_path):
    """Regression (round-8 advice): a <2-token doc must yield ZERO
    bigrams. The old sequence(1, greatest(size(w)-1, 0)) produced the
    DESCENDING [1, 0] for 1-token docs — INVALID_ARRAY_INDEX under ANSI
    mode, phantom NULL bigrams without it — while the DuckDB oracle's
    range(1, 1) is empty. Fixture corpora have no such docs, so this
    synth corpus pins the guard."""
    import math

    docs = (
        [(i, "alpha beta") for i in range(6)]
        + [(10 + i, "solo") for i in range(3)]
        + [(20, ""), (21, "   ")]  # empty + whitespace-only
    )
    d = str(tmp_path / "synth")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "synth" / "documents.parquet")
    )

    from pyconnect_spark.operators.text import tx47

    rows = tx47(spark, d).collect()
    # Only (alpha, beta) clears the >=5 count floor; one-word and empty
    # docs contribute unigrams (n = 12 + 3 + 2 = 17; the two degenerate
    # docs each tokenize to [""], matching DuckDB's string_split_regex)
    # but ZERO bigrams (b = 6). pmi = ln((6/6) / ((6/17)^2)) = ln(289/36).
    assert [
        (r.w1, r.w2, r.c_ab, r.c_a, r.c_b, r.pmi) for r in rows
    ] == [("alpha", "beta", 6, 6, 6, round(math.log(289.0 / 36.0), 6))]


def _clustered_sf_dir(spark, tmp_path, n=512):
    """Write the structured synthetic corpus as an sf_dir so the
    sf_dir-shaped builders can run on it (the IVF family's design-target
    data; the parquet fixture is the published i.i.d.-Gaussian worst
    case — see sm05/sm18 docstrings)."""
    from pyconnect_spark.operators.similarity import clustered_embeddings

    d = str(tmp_path / "clustered")
    clustered_embeddings(spark, n=n).write.parquet(
        str(tmp_path / "clustered" / "embeddings.parquet")
    )
    return d


def test_sm30b_scale_tier_equals_exact_on_clustered(spark, tmp_path):
    """Round-7 verdict task #2 (the dd09->dd12 precedent): the declared
    ANN-candidate scale tier must agree with the exact driver-collect
    tier on data with cluster structure. On the clustered fixture the
    IVF candidates contain every true top-1, so the mutual-NN pair sets
    are IDENTICAL (measured 88/88 both directions; on the i.i.d.
    parquet worst case recall is ~0.3 — exactly the sm05/sm18-documented
    IVF degradation, which is why docs/SCALE.md gates tier choice on the
    sm24/sm33 structure audits)."""
    from pyconnect_spark.operators.similarity import sm30, sm30b

    d = _clustered_sf_dir(spark, tmp_path)
    exact = {(r.vec_a, r.vec_b, r.cos_sim) for r in sm30(spark, d).collect()}
    scaled = {(r.vec_a, r.vec_b, r.cos_sim) for r in sm30b(spark, d).collect()}
    assert exact, "fixture must produce mutual pairs"
    assert scaled == exact, (len(scaled), len(exact), scaled ^ exact)


def test_sm23b_scale_tier_equals_exact_restricted_to_sample(spark, tmp_path):
    """sm23b = hubness over an md5 query sample against IVF candidates.
    On the clustered fixture the candidate step must lose NOTHING: the
    summary row equals a pure-numpy exact top-5 computed over the same
    deterministic sample (so the only declared delta vs sm23 is the
    sampling itself)."""
    import hashlib

    import numpy as np

    from pyconnect_spark.operators.similarity import (
        _SM23B_SAMPLE,
        clustered_embeddings,
        round9_half_up,
        sm23b,
    )

    n = 512
    d = _clustered_sf_dir(spark, tmp_path, n=n)
    rows = sorted(clustered_embeddings(spark, n=n).collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)

    def coin(vid):
        return int(hashlib.md5(f"hub:{vid}".encode()).hexdigest()[:8], 16) / 2**32

    sample = [int(v) for v in ids if coin(v) < _SM23B_SAMPLE]
    k = np.zeros(n)
    for q in sample:
        qi = int(np.where(ids == q)[0][0])
        s = round9_half_up((mat @ mat[qi]) / (nrm * nrm[qi]))
        s[qi] = -np.inf
        for j in np.lexsort((ids, -s))[:5]:
            k[j] += 1.0
    mu, m2r, m3r = k.mean(), (k * k).mean(), (k**3).mean()
    m2 = m2r - mu * mu
    want = (
        n,
        len(sample),
        int(k.max()),
        int(ids[k == k.max()].min()),
        round((k == 0).sum() / n, 6),
        round((m3r - 3 * mu * m2 - mu**3) / m2**1.5, 6),
    )
    got = sm23b(spark, d).collect()[0]
    assert (
        got.n_vectors,
        got.n_queries,
        got.max_nk,
        got.top_hub_id,
        got.antihub_frac,
        got.nk_skew,
    ) == want


def test_sm36_margin_separates_clustered_from_uniform(spark, tmp_path):
    """The silhouette gate must actually separate the two corpus shapes:
    corpus-wide mean assignment margin on the clustered fixture far
    above the i.i.d.-Gaussian parquet fixture, and boundary dwellers
    rare on clustered data. This is the measured input the SCALE.md §2
    index-choice gate relies on (the round-8 OPQ experiment showed
    rotation cannot substitute for this decision)."""
    from pyconnect_spark.operators.similarity import sm36

    d = _clustered_sf_dir(spark, tmp_path)

    def corpus_margin(sf):
        rows = sm36(spark, sf).collect()
        n = sum(r.n_vectors for r in rows)
        mean = sum(r.mean_margin * r.n_vectors for r in rows) / n
        boundary = sum(r.boundary_frac * r.n_vectors for r in rows) / n
        return mean, boundary

    m_clustered, b_clustered = corpus_margin(d)
    m_uniform, b_uniform = corpus_margin("/root/testdata/sf0.001")
    assert m_clustered > 3 * m_uniform, (m_clustered, m_uniform)
    # boundary_frac separates only weakly (measured 0.43 vs 0.57): with
    # ceil(sqrt(512)) = 23 seeds over 16 true clusters, several seeds
    # land in the SAME cluster, so a clustered vector's top-2 centroids
    # are often redundant twins — the metric reads quantizer redundancy
    # as well as data structure, which is why mean_margin (uncapped by
    # twins) is the primary gate number
    assert b_clustered < b_uniform, (b_clustered, b_uniform)


def test_round9_half_up_matches_engine_rounding(spark):
    """round9_half_up (the numpy-side 9-dp barrier) must agree with
    F.round/DuckDB round — HALF-UP away from zero — on exact boundary
    values where np.round (banker's) disagrees."""
    import duckdb
    import numpy as np

    cases = [1.5e-9, 2.5e-9, -1.5e-9, -2.5e-9, 0.1234567895, 7.0000000005]
    got = S.round9_half_up(np.array(cases))
    # np.round would give 2e-9 for BOTH 1.5e-9 and 2.5e-9 (half-to-even)
    want_duck = [
        float(
            duckdb.sql(f"SELECT round(CAST({repr(c)} AS DOUBLE), 9)").fetchone()[0]
        )
        for c in cases
    ]
    want_spark = [
        r[0]
        for r in spark.createDataFrame([(c,) for c in cases], "v double")
        .select(F.round("v", 9))
        .collect()
    ]
    assert list(got) == want_duck == want_spark, (list(got), want_duck, want_spark)
    # and the specific banker's divergence is real (sanity of the test)
    assert list(np.round(np.array([1.5e-9, 2.5e-9]), 9)) == [2e-9, 2e-9]
    assert list(got[:2]) == [2e-9, 3e-9]


def test_audit_corpus_matrix_caps_loudly(spark):
    """sm23/sm30's audit-tier collect must fail loudly past
    AUDIT_MAX_VECTORS instead of silently becoming a driver-memory bomb
    (round-8 advice item)."""
    import pytest as _pytest

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    ids, mat, nrm = S.audit_corpus_matrix(emb)
    assert len(ids) == 50 and mat.shape == (50, 2) and nrm.shape == (50,)

    import pyconnect_spark.operators.similarity as sim

    old = sim.AUDIT_MAX_VECTORS
    try:
        sim.AUDIT_MAX_VECTORS = 10
        with _pytest.raises(ValueError, match="audit tier got 50"):
            sim.audit_corpus_matrix(emb)
    finally:
        sim.AUDIT_MAX_VECTORS = old


def test_sm42b_scale_tier_agrees_with_exact_on_fixture(spark):
    """sm42b (IVF-candidate 5-NN label vote) must track exact sm42 where
    the candidate lists are faithful. On the parquet fixture the two
    tiers' per-label accuracies agree within 0.25 absolute for every
    label and the corpus-level means within 0.1 — the honest bound for
    n_probe=4 coarse quantization on i.i.d. data (the clustered design
    target recovers exact candidates; see sm30b's twin test)."""
    from pyconnect_spark.operators.similarity import sm42, sm42b

    sf = "/root/testdata/sf0.01"
    exact = {r.label: r for r in sm42(spark, sf).collect()}
    scaled = {r.label: r for r in sm42b(spark, sf).collect()}
    assert set(exact) == set(scaled)
    for lbl in exact:
        assert abs(exact[lbl].knn_accuracy - scaled[lbl].knn_accuracy) <= 0.25, lbl
    mean_e = sum(r.knn_accuracy for r in exact.values()) / len(exact)
    mean_s = sum(r.knn_accuracy for r in scaled.values()) / len(scaled)
    assert abs(mean_e - mean_s) <= 0.1, (mean_e, mean_s)


def test_sm48b_scale_tier_equals_exact_on_clustered(spark, tmp_path):
    """Round-9 verdict task #2 (the sm30b/sm42b precedent): the declared
    ANN-candidate bitext-mining tier must agree with the exact |A|x|B|
    tier on data with cluster structure. With the symmetric
    home-cell-in-probe-list candidate rule at n_probe=4, the candidate
    lists contain every true cross-group top-3 on the clustered
    fixture, so the mined pair sets — including BOTH margins and the
    accept bit — are IDENTICAL (measured 93/93; on the i.i.d. parquet
    worst case candidates degrade exactly as sm05/sm18 document, which
    is why docs/SCALE.md gates tier choice on the structure audits)."""
    from pyconnect_spark.operators.similarity import (
        clustered_embeddings,
        sm48,
        sm48b,
    )

    d = str(tmp_path / "clustered")
    clustered_embeddings(spark, n=512).withColumn(
        "label", (F.col("vec_id") % 10).cast("int")
    ).write.parquet(str(tmp_path / "clustered" / "embeddings.parquet"))
    key = lambda r: (r.a_id, r.b_id, r.cos_sim, r.margin_a, r.margin_b, r.accepted)
    exact = {key(r) for r in sm48(spark, d).collect()}
    scaled = {key(r) for r in sm48b(spark, d).collect()}
    assert exact, "fixture must mine pairs"
    assert scaled == exact, (len(scaled), len(exact), len(scaled ^ exact))


def test_sm46b_moment_identity_equals_pair_grid(spark):
    """sm46b is an algebraic rewrite, not an approximation: the per-label
    sum-vector identity reproduces sm46's pair-grid means cell-for-cell
    at the 6-dp output grain on the fixture (measured 0 diff — the only
    difference is where the 9-dp rounding sits, bounded ~2e-6), and the
    pair counts are identical by construction."""
    from pyconnect_spark.operators.similarity import sm46, sm46b

    sf = "/root/testdata/sf0.01"
    a = {r.label: r for r in sm46(spark, sf).collect()}
    b = {r.label: r for r in sm46b(spark, sf).collect()}
    assert set(a) == set(b)
    for lbl in a:
        assert a[lbl].n_intra == b[lbl].n_intra
        assert a[lbl].n_inter == b[lbl].n_inter
        for c in ("mean_intra_cos", "mean_inter_cos", "margin"):
            assert getattr(a[lbl], c) == getattr(b[lbl], c), (lbl, c)
