"""Similarity search over the ``embeddings`` table (list<float> column).

- :func:`q_ann_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once via ``ray.put``; each batch does one float64 matmul
  against it and emits a *partial* top-k, so the final merge handles
  (num_queries x k x num_blocks) rows, not N.  SQL oracle via DuckDB
  ``list_cosine_similarity``.
- :func:`q_embedding_near_dup` — all-pairs cosine >= threshold by
  blocked matmul against the broadcast full matrix (N x 64 floats is
  small; work N^2 is sharded across batches).  SQL oracle (self cross
  join).  At N where N x d no longer broadcasts, swap the broadcast for
  the LSH bucketing below.
- :func:`q_ann_lsh` — random-hyperplane LSH: sign-bit signatures ->
  bucket groupby -> exact cosine only within buckets (the scale path;
  recall vs brute force asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _emb_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pa.concat_tables(
        ray.get(rd.read_parquet(f"{sf_dir}/embeddings.parquet").to_arrow_refs())
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def q_ann_bruteforce(sf_dir: str, *, k: int = 5, num_queries: int = 5) -> pd.DataFrame:
    """Exact top-k cosine neighbours of the first ``num_queries`` vectors."""
    qids_all, qmat_all = _emb_matrix(sf_dir)
    qsel = qids_all < num_queries
    qids, qmat = qids_all[qsel], _normalize_rows(qmat_all[qsel])
    qref = ray.put((qids, qmat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def partial_topk(t: pa.Table) -> pa.Table:
        # plain task (not an actor): the broadcast ref resolves from the
        # local object store via shared memory, no pool spin-up cost
        qids_l, qmat_l = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize_rows(
            np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        sims = qmat_l @ m.T  # (Q x B)
        rows = {"qid": [], "vec_id": [], "sim": []}
        for qi, qid in enumerate(qids_l):
            s = sims[qi]
            cand = np.nonzero(ids != qid)[0]
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((ids[cand], -np.round(s[cand], 4)))][:k]
            rows["qid"].extend([qid] * len(order))
            rows["vec_id"].extend(ids[order])
            rows["sim"].extend(np.round(s[order], 4))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "sim": pa.array(rows["sim"], pa.float64()),
            }
        )

    partial = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], ignore_index=True)
        return g.head(k)

    df = partial.groupby("qid").map_groups(final_topk, batch_format="pandas").to_pandas()
    return df.sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True], ignore_index=True)


def q_embedding_near_dup(sf_dir: str, *, threshold: float = 0.45) -> pd.DataFrame:
    """All pairs with cosine >= threshold (embedding-cosine near-dup)."""
    ids_all, mat_all = _emb_matrix(sf_dir)
    ref = ray.put((ids_all, _normalize_rows(mat_all)))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def block_pairs(t: pa.Table) -> pa.Table:
        ids_l, mat_l = ray.get(ref)
        bids = t["vec_id"].to_numpy(zero_copy_only=False)
        bm = _normalize_rows(
            np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        sims = bm @ mat_l.T  # (B x N)
        bi, aj = np.nonzero(sims >= threshold)
        keep = bids[bi] < ids_l[aj]  # dedupe mirrored pairs: a < b
        bi, aj = bi[keep], aj[keep]
        return pa.table(
            {
                "vec_a": pa.array(bids[bi], pa.int64()),
                "vec_b": pa.array(ids_l[aj], pa.int64()),
                "sim": pa.array(np.round(sims[bi, aj], 4), pa.float64()),
            }
        )

    df = ds.map_batches(block_pairs, batch_format="pyarrow").to_pandas()
    return df.sort_values(["vec_a", "vec_b"], ignore_index=True)


def q_ann_lsh(
    sf_dir: str,
    *,
    k: int = 5,
    num_queries: int = 5,
    n_planes: int = 6,
    n_tables: int = 12,
    seed: int = 11,
) -> pd.DataFrame:
    """Multi-table random-hyperplane LSH approximate top-k: L independent
    sign-signature tables; a vector is a candidate if it collides with
    the query in ANY table (standard LSH OR-amplification — for cosine
    ~0.4 neighbours, one 6-plane table collides with p~0.08; 12 tables
    lift recall to ~1-(1-p)^12 ~ 0.63).  Exact cosine reranks the
    candidate union.  Tests measure recall vs :func:`q_ann_bruteforce`."""
    rng = np.random.default_rng(seed)
    qids_all, qmat_all = _emb_matrix(sf_dir)
    dim = qmat_all.shape[1]
    planes = rng.standard_normal((n_tables, dim, n_planes))
    qsel = qids_all < num_queries
    qids, qmat = qids_all[qsel], _normalize_rows(qmat_all[qsel])
    pow2 = 1 << np.arange(n_planes)
    qsig = np.stack([(qmat @ planes[t] > 0) @ pow2 for t in range(n_tables)], axis=1)  # (Q, L)
    qref = ray.put((qids, qmat, qsig, planes))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def bucket_scan(t: pa.Table) -> pa.Table:
        qids_l, qmat_l, qsig_l, planes_l = ray.get(qref)
        pow2_l = 1 << np.arange(planes_l.shape[2])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize_rows(
            np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        L = planes_l.shape[0]
        sig = np.stack([(m @ planes_l[ti] > 0) @ pow2_l for ti in range(L)], axis=1)  # (B, L)
        rows = {"qid": [], "vec_id": [], "sim": []}
        for qi, qid in enumerate(qids_l):
            collide = (sig == qsig_l[qi][None, :]).any(axis=1) & (ids != qid)
            cand = np.nonzero(collide)[0]
            if len(cand) == 0:
                continue
            s = m[cand] @ qmat_l[qi]
            order = np.lexsort((ids[cand], -np.round(s, 4)))[:k]
            rows["qid"].extend([qid] * len(order))
            rows["vec_id"].extend(ids[cand][order])
            rows["sim"].extend(np.round(s[order], 4))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "sim": pa.array(rows["sim"], pa.float64()),
            }
        )

    partial = ds.map_batches(bucket_scan, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "vec_id"], ascending=[False, True], ignore_index=True).head(k)

    df = partial.groupby("qid").map_groups(final_topk, batch_format="pandas").to_pandas()
    return df.sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True], ignore_index=True)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the other standard scale path next to LSH:
# k-means-lite centroids trained on a driver-side sample, broadcast once;
# each batch assigns its vectors to a cell; queries probe only the
# ``nprobe`` nearest cells.  At 100 TB the sample fits the driver (a few
# thousand vectors), centroid assignment is one matmul per batch, and
# the probed fraction bounds compute at nprobe/ncells of brute force.
def _kmeans_lite(sample: np.ndarray, ncells: int, iters: int = 8, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=ncells, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)  # cosine on normalized rows
        for c in range(ncells):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-30)
    return cent


def q_ann_ivf(
    sf_dir: str,
    *,
    k: int = 5,
    num_queries: int = 5,
    ncells: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2000,
) -> pd.DataFrame:
    """Approximate top-k via IVF cells (rows-only query; recall vs
    brute force is asserted in tests, mirroring q_ann_lsh)."""
    ids_all, mat_all = _emb_matrix(sf_dir)
    norm_all = _normalize_rows(mat_all)
    # train centroids on a deterministic sample (driver-side, tiny)
    sample = norm_all[: min(sample_rows, len(norm_all))]
    cent = _kmeans_lite(sample, min(ncells, len(sample)))

    qsel = ids_all < num_queries
    qids, qmat = ids_all[qsel], norm_all[qsel]
    # cells each query probes: nprobe nearest centroids
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    qref = ray.put((qids, qmat, qcells, cent))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def probe(t: pa.Table) -> pa.Table:
        qids_l, qmat_l, qcells_l, cent_l = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize_rows(
            np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        cells = np.argmax(m @ cent_l.T, axis=1)  # (B,) cell assignment
        rows = {"qid": [], "vec_id": [], "sim": []}
        for qi, qid in enumerate(qids_l):
            probe_mask = np.isin(cells, qcells_l[qi]) & (ids != qid)
            cand = np.nonzero(probe_mask)[0]
            if len(cand) == 0:
                continue
            s = m[cand] @ qmat_l[qi]
            order = np.lexsort((ids[cand], -np.round(s, 4)))[:k]
            rows["qid"].extend([qid] * len(order))
            rows["vec_id"].extend(ids[cand][order])
            rows["sim"].extend(np.round(s[order], 4))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "sim": pa.array(rows["sim"], pa.float64()),
            }
        )

    partial = ds.map_batches(probe, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "vec_id"], ascending=[False, True], ignore_index=True).head(k)

    df = partial.groupby("qid").map_groups(final_topk, batch_format="pandas").to_pandas()
    return df.sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True], ignore_index=True)
