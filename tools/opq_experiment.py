"""OPQ-rotation experiment for the PQ family's no-structure recall story
(round-7 verdict task #4).

sm17 (PQ-ADC) measures recall@5 = 0.76 and sm18 (IVFADC) 0.52 on the
parquet embeddings fixture — i.i.d. Gaussian, the published worst case
for coarse/product quantization. OPQ (Ge et al., CVPR 2013 "Optimized
Product Quantization") prepends a learned rotation R so the subspace
decomposition captures unevenly-distributed variance. This script runs
the PARAMETRIC OPQ variant (their §4: PCA eigenbasis + eigenvalue
allocation — assign principal dims to the 8 subspaces greedily
balancing the product of eigenvalues per subspace) as a deterministic,
data-derived rotation, plus an md5-seeded random rotation control, and
replays the repo's exact PQ construction (md5-order seed-vector
codebook, argmin-L2 encode, ADC over a top-100 shortlist, exact rerank)
in numpy on the same fixture.

Expected from theory, and what BASELINE.md records: on an ISOTROPIC
corpus every rotation leaves the distribution invariant, so OPQ cannot
help — its win exists exactly when sm34's anisotropy audit reports
structure to exploit. The point of the experiment is to pin that
negative result with numbers instead of assertion, and to justify the
corpus gate in docs/SCALE.md §2 (use the sm24/sm33/sm34 audits to pick
LSH over IVF/PQ on structure-free corpora).

    python tools/opq_experiment.py [sf_dir]
"""
from __future__ import annotations

import hashlib
import sys

import numpy as np
import pyarrow.parquet as pq


def md5_order(ids, salt=""):
    return sorted(ids, key=lambda v: (hashlib.md5(f"{v}{salt}".encode()).hexdigest(), v))


def pq_encode(mat, cb):
    """codes[i, j] = argmin_k ||mat[i, j*8:(j+1)*8] - cb[j, k]||^2."""
    n, d = mat.shape
    codes = np.zeros((n, 8), dtype=np.int64)
    for j in range(8):
        sub = mat[:, j * 8:(j + 1) * 8]
        d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)  # ties -> lower k, as argmin does
    return codes


def adc_recall(ids, mat, n_queries=5, k=5, shortlist=100, rot=None):
    """Replay sm17's PQ-ADC pipeline; return recall@k vs exact cosine."""
    x = mat if rot is None else mat @ rot
    # codebook: md5-order seed pick of 16 vectors (pq_codebook, salt="")
    seed_ids = md5_order(list(ids))[:16]
    pos = {v: i for i, v in enumerate(ids)}
    seeds = np.stack([x[pos[v]] for v in seed_ids])
    cb = np.stack([seeds[:, j * 8:(j + 1) * 8] for j in range(8)])
    codes = pq_encode(x, cb)

    # exact ground truth (rotation-invariant: R orthonormal)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    hits = 0
    for q in range(n_queries):
        qi = pos[q]
        sims = nm @ nm[qi]
        sims[qi] = -2
        truth = set(ids[np.argsort(-sims)[:k]])
        # ADC: LUT from the query's subvectors to every codeword
        lut = np.stack(
            [((cb[j] - x[qi][j * 8:(j + 1) * 8]) ** 2).sum(axis=1) for j in range(8)]
        )  # (8, 16)
        adc = lut[np.arange(8)[:, None], codes.T].sum(axis=0)
        adc[qi] = np.inf
        short = np.argsort(adc, kind="stable")[:shortlist]
        # exact rerank of the shortlist
        ssim = nm[short] @ nm[qi]
        got = set(ids[short[np.argsort(-ssim)[:k]]])
        hits += len(got & truth)
    return hits / (n_queries * k)


def eigenvalue_allocation_rotation(mat):
    """Parametric OPQ (Ge et al. §4): PCA-rotate, then permute principal
    dims so each 8-dim subspace gets a balanced product of eigenvalues
    (greedy: sort dims by eigenvalue desc, assign each to the open
    subspace with the smallest running log-eigenvalue sum)."""
    c = mat - mat.mean(axis=0)
    w, v = np.linalg.eigh(np.cov(c.T))
    order = np.argsort(-w)
    w, v = w[order], v[:, order]
    bins = [[] for _ in range(8)]
    load = np.zeros(8)
    for i in range(64):
        open_bins = [b for b in range(8) if len(bins[b]) < 8]
        b = min(open_bins, key=lambda b: load[b])
        bins[b].append(i)
        load[b] += np.log(max(w[i], 1e-12))
    perm = [i for b in bins for i in b]
    return v[:, perm]  # x @ R rotates into the allocated eigenbasis


def random_rotation(d, seed_key="opq:rot"):
    """md5-seeded orthonormal rotation (QR of a deterministic Gaussian)."""
    raw = b"".join(
        hashlib.md5(f"{seed_key}:{i}".encode()).digest() for i in range(d * d)
    )
    u = np.frombuffer(raw, dtype=np.uint64).astype(np.float64)[: d * d]
    g = np.sqrt(-2 * np.log((u % 2**52 + 1) / 2**52))  # crude but deterministic
    q, r = np.linalg.qr(g.reshape(d, d))
    return q * np.sign(np.diag(r))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id")
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    print(f"corpus: {mat.shape[0]} x {mat.shape[1]} from {sf}")
    base = adc_recall(ids, mat)
    print(f"PQ-ADC recall@5, identity (sm17 replication): {base:.2f}")
    opq = adc_recall(ids, mat, rot=eigenvalue_allocation_rotation(mat))
    print(f"PQ-ADC recall@5, parametric-OPQ rotation:     {opq:.2f}")
    rnd = adc_recall(ids, mat, rot=random_rotation(mat.shape[1]))
    print(f"PQ-ADC recall@5, md5 random rotation:         {rnd:.2f}")
    # anisotropy context: is there variance structure for OPQ to exploit?
    w = np.linalg.eigvalsh(np.cov((mat - mat.mean(axis=0)).T))
    print(f"eigenvalue spread max/min: {w.max() / w.min():.2f} "
          f"(isotropic -> ~1; OPQ's win grows with this)")


if __name__ == "__main__":
    main()
