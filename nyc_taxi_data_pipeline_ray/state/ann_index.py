"""Persisted, incrementally-updatable IVF index over embeddings.

The similarity-search analog of :mod:`state.dedup_index` (the same
segment/marker/compact ledger idiom): a training-data loop receives
embeddings EPOCH BY EPOCH and must serve "nearest accepted neighbours"
probes against everything already indexed.  The batch pipelines
(``pipelines/ann.py q_ann_ivf/q_ann_lsh``) rescan the FULL corpus per
query batch — fine for one-off jobs, O(corpus) per probe forever.  This
index persists the IVF cell assignment once, so:

- ``add()``      is O(new vectors): assign to cells via the broadcast
                 coarse quantizer, one bounded groupby exchange, one
                 parquet file per touched cell;
- ``probe()``    is O(probed cells): reads ONLY the ``nprobe`` nearest
                 cells' files per query batch (partition pruning by
                 filename), never the other ``ncells - nprobe`` cells;
- ``compact()``  folds segments per cell when file counts grow (LSM).

Storage layout under ``path/`` (cf. ``dedup_index.py:12-19``):

- ``meta.json``                 write-once params INCLUDING the trained
                                centroids, so every opener quantizes
                                identically (an IVF index is only valid
                                under one fixed coarse quantizer)
- ``seg-NNNNNN/cell=CC.parquet``  vectors of segment N in cell CC
- ``seg-NNNNNN.json``           segment commit marker (tmp+rename after
                                the cell files; a crashed add leaves
                                orphan parquet the retry overwrites)
- ``base-GGGGGG/cell=CC.parquet`` + ``base-GGGGGG.json``  compacted runs

Exactness: probing ALL cells (``nprobe == ncells``) visits every stored
vector exactly once, so it reproduces brute-force top-k bit for bit
(same rounding and tie order as ``q_ann_bruteforce``) — the driver-
checkable witness configuration.  Production probes trade recall for
the O(probed cells) read, measured in tests against brute force.

Reference analog: none (the reference has no vector surface); the shape
follows the public IVF literature (Jegou et al., "Product Quantization
for Nearest Neighbor Search", the inverted-file half) re-expressed as
Ray Data stages over partitioned parquet.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from nyc_taxi_data_pipeline_ray.state import manifest as mf

TOPK_SCHEMA = pa.schema(
    [
        ("qid", pa.int64()),
        ("vec_id", pa.int64()),
        ("sim", pa.float64()),
    ]
)


def _empty_topk() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in TOPK_SCHEMA})


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


class IvfIndex:
    """Bucket-partitioned persisted IVF index with an ``add / probe /
    compact`` lifecycle.  ``centroids`` are required at creation (train
    them on any sample, e.g. ``pipelines.ann._kmeans_lite``) and are
    frozen into ``meta.json``; reopening ignores the argument."""

    def __init__(self, path: str, *, centroids: np.ndarray | None = None):
        self.path = path
        meta_path = os.path.join(path, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.centroids = _normalize_rows(np.asarray(meta["centroids"], np.float64))
        else:
            if centroids is None:
                # read-only open of a path that was never created: fail
                # WITHOUT the makedirs side effect (a mistyped ann-probe
                # path must not leave an empty dir behind)
                raise FileNotFoundError(
                    f"no IvfIndex at {path!r} (meta.json missing); "
                    "pass trained centroids to create one"
                )
            os.makedirs(path, exist_ok=True)
            self.centroids = _normalize_rows(np.asarray(centroids, np.float64))
            mf.atomic_write_json(
                meta_path,
                {
                    "ncells": int(self.centroids.shape[0]),
                    "dim": int(self.centroids.shape[1]),
                    "centroids": self.centroids.tolist(),
                },
            )

    @property
    def ncells(self) -> int:
        return int(self.centroids.shape[0])

    # ---------------------------------------------------------------- ledger
    def _manifest_path(self, segment_id: int) -> str:
        return os.path.join(self.path, f"seg-{segment_id:06d}.json")

    def segments(self) -> list[int]:
        """Every committed segment id, INCLUDING ones folded into a
        base — manifests are the ledger (idempotent add needs them)."""
        return sorted(
            int(name[4:-5])
            for name in os.listdir(self.path)
            if name.startswith("seg-") and name.endswith(".json")
        )

    def _base(self) -> tuple[int, int] | None:
        best = None
        for name in os.listdir(self.path):
            if name.startswith("base-") and name.endswith(".json"):
                with open(os.path.join(self.path, name)) as f:
                    m = json.load(f)
                if best is None or m["generation"] > best[0]:
                    best = (int(m["generation"]), int(m["through_segment"]))
        return best

    def _read_runs(self) -> list[str]:
        """Run directories a probe reads: newest base + live segments."""
        base = self._base()
        if base is None:
            return [os.path.join(self.path, f"seg-{s:06d}") for s in self.segments()]
        gen, through = base
        return [os.path.join(self.path, f"base-{gen:06d}")] + [
            os.path.join(self.path, f"seg-{s:06d}")
            for s in self.segments()
            if s > through
        ]

    # ------------------------------------------------------------------- add
    def add(self, vectors: rd.Dataset, segment_id: int) -> dict:
        """Index a new (vec_id, embedding) batch as one committed
        segment.  Idempotent on segment_id (replay-safe for WAL-epoch-
        driven callers).  One bounded exchange: cell assignment happens
        map-side against the broadcast quantizer; each cell's rows land
        in one parquet file."""
        if segment_id in self.segments():
            return {"segment": segment_id, "skipped": True}
        seg_dir = os.path.join(self.path, f"seg-{segment_id:06d}")
        # wipe, don't reuse: a crashed add may have left cell files for a
        # DIFFERENT batch; a retry that routes to a different cell set
        # would otherwise commit those phantom rows under its marker
        # (same hazard as engine.apply's staging wipe).  The dir is
        # invisible to readers until the manifest lands, so this is safe.
        shutil.rmtree(seg_dir, ignore_errors=True)
        os.makedirs(seg_dir, exist_ok=True)
        cent = self.centroids

        def assign(t: pa.Table) -> pa.Table:
            m = _normalize_rows(
                np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
                    np.float64
                )
            )
            cells = np.argmax(m @ cent.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    "cell": pa.array(cells),
                    "vec_id": t["vec_id"],
                    "embedding": t["embedding"],
                }
            )

        def write_cell(g: pa.Table) -> pa.Table:
            c = int(g["cell"][0].as_py())
            path = os.path.join(seg_dir, f"cell={c:04d}.parquet")
            tmp = path + ".tmp"
            pq.write_table(g.drop_columns(["cell"]), tmp)
            os.replace(tmp, path)
            return pa.table({"cell": pa.array([c], pa.int32()), "rows": [g.num_rows]})

        stats = (
            vectors.map_batches(assign, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(write_cell, batch_format="pyarrow")
            .to_pandas()  # <= ncells rows
        )
        n = int(stats["rows"].sum()) if len(stats) else 0
        mf.atomic_write_json(
            self._manifest_path(segment_id), {"segment": segment_id, "vectors": n}
        )
        return {"segment": segment_id, "skipped": False, "vectors": n}

    # ----------------------------------------------------------------- probe
    def probe(
        self,
        qids: np.ndarray,
        qmat: np.ndarray,
        *,
        k: int = 5,
        nprobe: int = 4,
    ) -> tuple[pd.DataFrame, dict]:
        """Top-k cosine neighbours of each query among the INDEXED
        vectors, reading only each query's ``nprobe`` nearest cells.
        Returns ``(topk_df, stats)`` where stats reports the pruning
        (``files_read`` / ``files_total``).  With ``nprobe == ncells``
        the result equals brute force over the indexed corpus exactly
        (same 4-dp rounding and (sim desc, vec_id asc) tie order as
        ``q_ann_bruteforce``).

        Reader-vs-compactor: a concurrent ``compact()`` removes folded
        run dirs only AFTER the new base marker lands, so a probe that
        raced it re-lists once and reads a consistent newer view (the
        same one-retry idiom as the engine's pruned key readers)."""
        try:
            return self._probe_once(qids, qmat, k=k, nprobe=nprobe)
        except Exception as e:  # FileNotFoundError, possibly Ray-wrapped
            cause = getattr(e, "cause", None)
            if isinstance(e, FileNotFoundError) or isinstance(
                cause, FileNotFoundError
            ):
                return self._probe_once(qids, qmat, k=k, nprobe=nprobe)
            raise

    def probe_and_add(
        self,
        vectors: rd.Dataset,
        segment_id: int,
        *,
        k: int = 5,
        nprobe: int = 4,
        probe_chunk: int = 4096,
    ) -> tuple[pd.DataFrame, dict]:
        """The ingest-loop primitive, mirroring
        :meth:`state.dedup_index.MinHashIndex.probe_and_add`: probe the
        batch against the STRICTLY-EARLIER committed segments
        (id < segment_id), then commit it as ``segment_id``.  Probing
        only earlier segments makes a replay return exactly the hits
        the first attempt returned (the batch never matches itself), so
        callers can treat (hits, report) as a deterministic function of
        the WAL epoch — the add stays idempotent on segment_id either
        way.  Queries stream through the caller in bounded
        ``probe_chunk`` slices, so driver memory is O(chunk), never
        O(epoch).

        Compaction interplay: once a ``compact()`` folds past
        ``segment_id``, the strictly-earlier view is gone.  A replay of
        an epoch that was ALREADY COMMITTED before the fold returns
        ``(empty, {"skipped": True, "folded": True})`` — the commit is
        safe to skip, but the original hits are not reproducible, so
        ingest loops must persist each epoch's hits before compacting
        past it.  An UNcommitted ``segment_id`` at or below the fold
        watermark raises: its segment dir would be invisible to every
        reader (``_read_runs`` lists only ``s > through``), silently
        losing the vectors."""
        base = self._base()
        if base is not None and base[1] >= segment_id:
            if segment_id in self.segments():
                return _empty_topk().to_pandas(), {
                    "segment": segment_id,
                    "skipped": True,
                    "folded": True,
                }
            raise ValueError(
                f"segment {segment_id} was never committed and is at or below "
                f"base generation {base[0]}'s fold watermark ({base[1]}); "
                "adding it now would be invisible to readers"
            )
        gen_through = base
        run_dirs = (
            [os.path.join(self.path, f"base-{gen_through[0]:06d}")]
            if gen_through
            else []
        ) + [
            os.path.join(self.path, f"seg-{s:06d}")
            for s in self.segments()
            if s > (gen_through[1] if gen_through else -1) and s < segment_id
        ]
        # materialize once: the probe's iter_batches and the add would
        # otherwise each re-execute the input read (double I/O, and a
        # source mutated between the passes would commit vectors the
        # probe never saw) — the same reason MinHashIndex.probe_and_add
        # materializes its band rows.  Epoch-sized, never corpus-sized.
        vectors = vectors.materialize()
        hits: list[pd.DataFrame] = []
        if run_dirs:
            for chunk in vectors.iter_batches(
                batch_size=probe_chunk, batch_format="pyarrow"
            ):
                qids = chunk["vec_id"].to_numpy(zero_copy_only=False)
                qmat = np.stack(
                    chunk["embedding"].to_numpy(zero_copy_only=False)
                ).astype(np.float64)
                df, _stats = self._probe_once(
                    qids, qmat, k=k, nprobe=nprobe, run_dirs=run_dirs
                )
                if len(df):
                    hits.append(df)
        out = (
            pd.concat(hits, ignore_index=True) if hits else _empty_topk().to_pandas()
        )
        if segment_id in self.segments():
            return out, {"segment": segment_id, "skipped": True}
        return out, self.add(vectors, segment_id)

    def _probe_once(
        self,
        qids: np.ndarray,
        qmat: np.ndarray,
        *,
        k: int,
        nprobe: int,
        run_dirs: list[str] | None = None,
    ) -> tuple[pd.DataFrame, dict]:
        import ray

        qmat = _normalize_rows(np.asarray(qmat, np.float64))
        qcells = np.argsort(-(qmat @ self.centroids.T), axis=1)[:, : min(nprobe, self.ncells)]
        if run_dirs is None:
            run_dirs = self._read_runs()
        needed = sorted(set(qcells.ravel().tolist()))
        files = [
            (c, p)
            for c in needed
            for d in run_dirs
            for p in [os.path.join(d, f"cell={c:04d}.parquet")]
            if os.path.exists(p)
        ]
        files_total = sum(
            1 for d in run_dirs for f in os.listdir(d) if f.endswith(".parquet")
        )
        stats = {
            "cells_probed": len(needed),
            "cells_total": self.ncells,
            "files_read": len(files),
            "files_total": files_total,
        }
        if not files:
            return _empty_topk().to_pandas(), stats

        qref = ray.put((qids, qmat, qcells))
        k_ = k

        def probe_file(t: pa.Table) -> pa.Table:
            qids_l, qmat_l, qcells_l = ray.get(qref)
            out = []
            for row in t.to_pylist():  # one row per (cell, path) descriptor
                c, path = int(row["cell"]), row["path"]
                stored = pq.read_table(path)
                if stored.num_rows == 0:
                    continue
                ids = stored["vec_id"].to_numpy(zero_copy_only=False)
                m = _normalize_rows(
                    np.stack(stored["embedding"].to_numpy(zero_copy_only=False)).astype(
                        np.float64
                    )
                )
                for qi, qid in enumerate(qids_l):
                    if c not in qcells_l[qi]:
                        continue
                    cand = np.nonzero(ids != qid)[0]
                    if len(cand) == 0:
                        continue
                    s = m[cand] @ qmat_l[qi]
                    order = cand[np.lexsort((ids[cand], -np.round(s, 4)))][:k_]
                    out.append(
                        pa.table(
                            {
                                "qid": pa.array([qid] * len(order), pa.int64()),
                                "vec_id": pa.array(ids[order], pa.int64()),
                                "sim": pa.array(
                                    np.round(m[order] @ qmat_l[qi], 4), pa.float64()
                                ),
                            }
                        )
                    )
            return pa.concat_tables(out) if out else _empty_topk()

        desc = pa.table(
            {
                "cell": pa.array([c for c, _ in files], pa.int32()),
                "path": pa.array([p for _, p in files], pa.string()),
            }
        )
        partial = (
            rd.from_arrow(desc)
            .repartition(len(files))
            .map_batches(probe_file, batch_format="pyarrow", batch_size=None)
        )

        def final_topk(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(
                ["sim", "vec_id"], ascending=[False, True], ignore_index=True
            ).head(k_)

        df = (
            partial.groupby("qid")
            .map_groups(final_topk, batch_format="pandas")
            .to_pandas()
        )
        df = df.sort_values(
            ["qid", "sim", "vec_id"], ascending=[True, False, True], ignore_index=True
        )
        return df, stats

    # --------------------------------------------------------------- compact
    def vacuum(self) -> dict:
        """Remove run DIRECTORIES already folded into the newest base.

        A ``compact()`` crash between its base-marker write and the
        rmtree sweep would otherwise orphan the folded dirs forever
        (the next compact sees one live run and skips).  Also reclaims
        a partial ``base-*/`` dir whose marker never landed.  Single
        writer assumed, as everywhere in this ledger idiom."""
        import shutil

        base = self._base()
        if base is None:
            return {"removed": 0}
        gen, through = base
        removed = 0
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if not os.path.isdir(full):
                continue
            dead = (name.startswith("base-") and name != f"base-{gen:06d}") or (
                name.startswith("seg-") and int(name[4:]) <= through
            )
            if dead:
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
        return {"removed": removed}

    def compact(self) -> dict:
        """Fold base + live segments into one new base generation (per
        cell, one Ray task each), then drop the folded runs.  Probes
        running concurrently keep working: the old runs are removed only
        after the new base's marker lands (readers re-list on miss).
        Starts with a :meth:`vacuum` so a previously crashed compact's
        orphans are reclaimed before deciding whether to skip."""
        self.vacuum()
        runs = self._read_runs()
        if len(runs) <= 1:
            return {"skipped": True, "runs": len(runs)}
        base = self._base()
        gen = (base[0] + 1) if base else 1
        through = max(self.segments())
        out_dir = os.path.join(self.path, f"base-{gen:06d}")
        os.makedirs(out_dir, exist_ok=True)
        cells = sorted(
            {
                int(f[5:-8])
                for d in runs
                for f in os.listdir(d)
                if f.startswith("cell=") and f.endswith(".parquet")
            }
        )
        if cells:

            def fold_cell(t: pa.Table) -> pa.Table:
                out_c, out_n = [], []
                for c in t["cell"].to_pylist():
                    c = int(c)
                    parts = [
                        pq.read_table(os.path.join(d, f"cell={c:04d}.parquet"))
                        for d in runs
                        if os.path.exists(os.path.join(d, f"cell={c:04d}.parquet"))
                    ]
                    merged = pa.concat_tables(parts, promote_options="default")
                    merged = merged.sort_by([("vec_id", "ascending")])
                    path = os.path.join(out_dir, f"cell={c:04d}.parquet")
                    tmp = path + ".tmp"
                    pq.write_table(merged, tmp)
                    os.replace(tmp, path)
                    out_c.append(c)
                    out_n.append(merged.num_rows)
                return pa.table(
                    {"cell": pa.array(out_c, pa.int32()), "rows": pa.array(out_n, pa.int64())}
                )

            (
                rd.from_arrow(pa.table({"cell": pa.array(cells, pa.int32())}))
                .repartition(len(cells))
                .map_batches(fold_cell, batch_format="pyarrow", batch_size=None)
                .count()
            )
        mf.atomic_write_json(
            os.path.join(self.path, f"base-{gen:06d}.json"),
            {"generation": gen, "through_segment": through, "cells": len(cells)},
        )
        # reclaim the folded runs (markers stay: they are the add ledger)
        import shutil

        for d in runs:
            shutil.rmtree(d, ignore_errors=True)
        return {"skipped": False, "generation": gen, "cells": len(cells)}
