"""CdcEngine — WAL replay -> keyed LWW upsert into a partitioned Parquet lake.

The Ray-Data-native replacement for the reference's whole ELT loop:

- discovery of unapplied input (``airflow/dags/scripts/sync_manager.py:24-58``
  month-walk + S3 head_object)            -> :meth:`CdcEngine.discover`
- idempotent bulk load (``nyc_taxi_sync_dag.py:41-48`` COPY INTO ...
  FILES=(...))                            -> :meth:`CdcEngine.apply`
- incremental keyed merge (``nyc_taxi_dbt/models/marts/core/
  fct_trips.sql:1-13``)                   -> per-partition LWW delta runs
- schema evolution (``snowflake/setup.sql:58-61``) -> Arrow unification
- checkpoint/resume (``streaming/spark/fraud_detector.py:190``)
                                          -> epoch manifests + markers
- Redis counters (``fraud_detector.py:54-118``) -> manifest lineage,
  merged monoid-style by :meth:`CdcEngine.metrics`

Dataflow of one :meth:`apply` run (a group of unapplied epochs)::

    ray.data.read_parquet(epoch segment files)          # columnar, pruned
      .map_batches(_PrepareBatch, pyarrow)              # validate + pid +
                                                        #   per-batch LWW
                                                        #   pre-combine
      [.groupby(pid, salt).map_groups(combine)]         # optional salted
                                                        #   stage for skew
      .groupby(pid).map_groups(_apply_partition)        # ONE shuffle; each
                                                        #   task owns one
                                                        #   lake partition
      -> tiny per-partition report rows -> driver commit marker

The only all-to-all exchange is the hash shuffle on ``_pid``; per-batch
pre-combine collapses repeated writes to the same key *before* the
shuffle (combiner pattern), which is what bounds skew from hot
conversations together with the optional salted stage.  State lives in
the lake (base + delta runs per partition), never in actor memory —
tasks are stateless and retryable; the manifest is the unit of truth.
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from nyc_taxi_data_pipeline_ray import schemas
from nyc_taxi_data_pipeline_ray.config import LakeConfig
from nyc_taxi_data_pipeline_ray.stages import validate as validate_mod
from nyc_taxi_data_pipeline_ray.state import manifest as mf
from nyc_taxi_data_pipeline_ray.state import merge as mg

_EPOCH_DIR_RE = re.compile(r"epoch=(\d{6})$")
PID_COL = "_pid"
SALT_COL = "_salt"


def hash_partition_ids(conv_id: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic (process-stable) hash partitioning of conv_id.

    Uses pandas' vectorized siphash with a fixed key — NOT Python
    ``hash()`` (salted per process, which would break resume).
    """
    arr = conv_id.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int32)


class _PrepareBatch:
    """Stateless map_batches stage: validity tag + partition id + per-batch
    LWW pre-combine (the combiner that runs *before* the shuffle)."""

    def __init__(self, num_partitions: int, salt_shards: int = 1, target_schema: pa.Schema | None = None):
        self.num_partitions = num_partitions
        self.salt_shards = salt_shards
        self.target_schema = target_schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.target_schema is not None:
            batch = mg.conform(batch, self.target_schema)
        good, bad = validate_mod.split_valid(batch)
        # combiner: one surviving row per key per batch (keeps tombstones);
        # _nsrc preserves exact source-row lineage across the collapse
        good = good.append_column(mg.NSRC, pa.array(np.ones(good.num_rows, np.int64)))
        good = mg.resolve_lww(mg.with_run_seq(good, 0), drop_tombstones=False)
        good = good.drop_columns([mg.RUN_SEQ])
        pid = hash_partition_ids(good["conv_id"], self.num_partitions)
        good = good.append_column(PID_COL, pa.array(pid, pa.int32()))
        if bad.num_rows:
            bad = bad.append_column(mg.NSRC, pa.array(np.ones(bad.num_rows, np.int64)))
            bad_pid = np.zeros(bad.num_rows, np.int32)
            bad = bad.append_column(PID_COL, pa.array(bad_pid, pa.int32()))
            bad = bad.append_column(validate_mod.VALID_COL, pa.array(np.zeros(bad.num_rows, bool)))
            good = good.append_column(
                validate_mod.VALID_COL, pa.array(np.ones(good.num_rows, bool))
            )
            if self.salt_shards > 1:
                good = _add_salt(good, self.salt_shards)
                bad = _add_salt(bad, 1)
            return mg.concat_unified([good, bad])
        good = good.append_column(validate_mod.VALID_COL, pa.array(np.ones(good.num_rows, bool)))
        if self.salt_shards > 1:
            good = _add_salt(good, self.salt_shards)
        return good


def _add_salt(t: pa.Table, shards: int) -> pa.Table:
    salt = (t["lsn"].to_numpy(zero_copy_only=False) % shards).astype(np.int32)
    return t.append_column(SALT_COL, pa.array(salt, pa.int32()))


def _salted_combine(group: pa.Table) -> pa.Table:
    """Stage-1 combine for hot-key skew: collapses one (pid, salt) slice."""
    mask = group[validate_mod.VALID_COL]
    good = group.filter(mask)
    bad = group.filter(pc.invert(mask))
    good = mg.resolve_lww(mg.with_run_seq(good, 0), drop_tombstones=False)
    good = good.drop_columns([mg.RUN_SEQ])
    return mg.concat_unified([good, bad])


@dataclass
class ApplyReport:
    epochs: list[int]
    partitions: int = 0
    rows_in: int = 0
    rejects: int = 0
    upserts: int = 0
    deletes: int = 0
    skipped_partitions: int = 0
    seconds: float = 0.0
    details: list[dict] = field(default_factory=list)


class CdcEngine:
    def __init__(self, cfg: LakeConfig):
        self.cfg = cfg
        cfg.save()

    # ------------------------------------------------------------- discovery
    def discover(self, wal_dir: str) -> list[tuple[int, list[str]]]:
        """Unapplied epochs, oldest first: [(epoch, [segment files])].

        The smart-sync analog: instead of per-month S3 ``head_object``
        checks (``sync_manager.py:38-41``), list WAL epoch dirs and diff
        against the lake's global epoch markers.
        """
        done = self._global_committed()
        out = []
        for name in sorted(os.listdir(wal_dir)):
            m = _EPOCH_DIR_RE.match(name)
            if not m:
                continue
            epoch = int(m.group(1))
            if epoch in done:
                continue
            d = os.path.join(wal_dir, name)
            files = sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
            if files:
                out.append((epoch, files))
        return out

    def _global_committed(self) -> set[int]:
        d = os.path.join(self.cfg.path, "_epochs")
        if not os.path.isdir(d):
            return set()
        out = set()
        for name in os.listdir(d):
            m = re.match(r"epoch-(\d{6})\.json$", name)
            if m:
                out.add(int(m.group(1)))
        return out

    # ----------------------------------------------------------------- apply
    def apply(self, wal_dir: str, *, max_epochs: int | None = None) -> ApplyReport:
        """Apply all (or the next ``max_epochs``) unapplied epochs as one
        Dataset pipeline run.  Idempotent: committed partition-epochs are
        skipped inside the apply tasks; a fully committed run is a no-op."""
        work = self.discover(wal_dir)
        if max_epochs is not None:
            work = work[:max_epochs]
        if not work:
            return ApplyReport(epochs=[])
        epochs = [e for e, _ in work]
        files = [f for _, fs in work for f in fs]
        t0 = time.perf_counter()

        # schema evolution across epochs: unify per-epoch file schemas
        # (driver-side footer read, one file per epoch) and conform every
        # batch to the union before the shuffle, so heterogeneous WAL
        # segments (added columns, widened ints) coexist in one run.
        epoch_schemas = [pq.read_schema(fs[0]) for _, fs in work]
        target_schema = schemas.unify(*epoch_schemas)

        if len({s.to_string() for s in epoch_schemas}) == 1:
            ds = rd.read_parquet(files)
        else:
            parts = [rd.read_parquet(fs) for _, fs in work]
            ds = parts[0].union(*parts[1:])
        ds = ds.map_batches(
            _PrepareBatch(self.cfg.num_partitions, self.cfg.salt_shards, target_schema),
            batch_format="pyarrow",
            batch_size=self.cfg.batch_size,
        )
        if self.cfg.salt_shards > 1:
            ds = ds.groupby([PID_COL, SALT_COL]).map_groups(
                _salted_combine, batch_format="pyarrow"
            )
            ds = ds.drop_columns([SALT_COL])

        lake_path = self.cfg.path
        group_id = max(epochs)
        epoch_set = set(epochs)
        max_delta_runs = self.cfg.max_delta_runs

        def apply_partition(group: pa.Table) -> pa.Table:
            return _apply_partition(
                group, lake_path, group_id, epoch_set, max_delta_runs
            )

        reports = ds.groupby(PID_COL).map_groups(
            apply_partition, batch_format="pyarrow"
        ).take_all()

        # global commit markers (driver-side, after every partition landed)
        for e in epochs:
            mf.atomic_write_json(
                os.path.join(self.cfg.path, "_epochs", f"epoch-{e:06d}.json"),
                {"epoch": e, "group_id": group_id, "partitions": len(reports)},
            )
        rep = ApplyReport(epochs=epochs, seconds=time.perf_counter() - t0)
        for r in reports:
            rep.partitions += 1
            if r.get("skipped"):
                rep.skipped_partitions += 1
            rep.rows_in += r.get("rows_in", 0)
            rep.rejects += r.get("rejects", 0)
            rep.upserts += r.get("upserts", 0)
            rep.deletes += r.get("deletes", 0)
            rep.details.append(r)
        return rep

    # ------------------------------------------------------------ compaction
    def compact(self, pids: list[int] | None = None, *, force: bool = True) -> int:
        """Merge each partition's base + delta runs into a new base
        generation (LSM compaction).  Distributed: one Ray task per
        partition via map_batches over partition descriptors."""
        pids = pids if pids is not None else self._live_pids()
        if not pids:
            return 0
        lake_path = self.cfg.path

        def compact_one(batch: pa.Table) -> pa.Table:
            done = []
            for pid in batch["pid"].to_pylist():
                done.append(_compact_partition(lake_path, int(pid), force=force))
            return pa.table({"pid": batch["pid"], "compacted": pa.array(done, pa.bool_())})

        ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
        ds = ds.repartition(len(pids)).map_batches(compact_one, batch_format="pyarrow")
        return sum(1 for r in ds.take_all() if r["compacted"])

    def _live_pids(self) -> list[int]:
        out = []
        if not os.path.isdir(self.cfg.path):
            return out
        for name in os.listdir(self.cfg.path):
            m = re.match(r"p=(\d{4})$", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    # -------------------------------------------------------------- snapshot
    def snapshot(self, columns: list[str] | None = None) -> rd.Dataset:
        """The lake's current state as a Dataset (one merge task per
        partition; fully-compacted partitions are a plain columnar read).

        Output rows are unique on (conv_id, turn_idx) and sorted by that
        key *within* each partition — the stable turn ordering the
        equality oracle requires is obtained with a final global sort by
        the caller when needed.
        """
        pids = self._live_pids()
        lake_path = self.cfg.path
        if not pids:
            return rd.from_arrow(
                pa.table({f.name: pa.array([], f.type) for f in schemas.TRANSCRIPT_SCHEMA})
            )

        def read_one(batch: pa.Table) -> pa.Table:
            parts = [
                _read_partition_state(lake_path, int(pid))
                for pid in batch["pid"].to_pylist()
            ]
            parts = [p for p in parts if p is not None and p.num_rows]
            if not parts:
                return pa.table(
                    {f.name: pa.array([], f.type) for f in schemas.TRANSCRIPT_SCHEMA}
                )
            out = mg.concat_unified(parts)
            if columns:
                out = out.select([c for c in columns if c in out.schema.names])
            return out

        ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
        return ds.repartition(len(pids)).map_batches(
            read_one, batch_format="pyarrow", batch_size=None
        )

    def snapshot_table(self, columns: list[str] | None = None) -> pa.Table:
        """Materialized, globally key-sorted snapshot (tests / small lakes)."""
        batches = [
            b
            for b in self.snapshot(columns=columns).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if b.num_rows
        ]
        if not batches:
            return pa.table({f.name: pa.array([], f.type) for f in schemas.TRANSCRIPT_SCHEMA})
        t = mg.concat_unified([pa.table(b) if isinstance(b, dict) else b for b in batches])
        return mg.sort_by_key(t)

    # --------------------------------------------------------------- metrics
    def metrics(self) -> dict:
        """Monoid-merged lineage counters across all committed
        partition-epoch manifests (the Redis-dashboard analog,
        ``streaming/dashboard/utils/redis_client.py:22-138``)."""
        all_manifests = []
        for pid in self._live_pids():
            all_manifests.extend(mf.read_manifests(self.cfg.path, pid))
        counters = mf.merge_counters(all_manifests)
        counters["partitions"] = len(self._live_pids())
        counters["committed_epochs"] = len(self._global_committed())
        return counters


# ---------------------------------------------------------------- task bodies


def _apply_partition(
    group: pa.Table,
    lake_path: str,
    group_id: int,
    epoch_set: set[int],
    max_delta_runs: int,
) -> pa.Table:
    """Runs inside one Ray task per lake partition. Exactly-once via the
    manifest commit protocol (see state/manifest.py docstring)."""
    pid = int(group[PID_COL][0].as_py())
    group = group.drop_columns([PID_COL])

    already = mf.committed_epoch_groups(lake_path, pid)
    new_epochs = sorted(e for e in epoch_set if e not in already)
    if not new_epochs:
        return _report_row(pid, skipped=True)
    # a retry after partial commit: only count/apply uncommitted epochs
    group = group.filter(
        pc.is_in(group["epoch"], value_set=pa.array(new_epochs, group["epoch"].type))
    )
    if group.num_rows == 0:
        # still record the commit so this partition never re-scans the epoch
        _write_manifest(lake_path, pid, group_id, new_epochs, counters={"rows_in": 0})
        return _report_row(pid, skipped=False)

    mask = group[validate_mod.VALID_COL]
    good = group.filter(mask).drop_columns([validate_mod.VALID_COL])
    bad = group.filter(pc.invert(mask)).drop_columns([validate_mod.VALID_COL])

    # exact lineage despite the pre-shuffle combiner: _nsrc sums source rows
    n_valid_src = int(pc.sum(good[mg.NSRC]).as_py() or 0) if good.num_rows else 0
    n_bad_src = int(pc.sum(bad[mg.NSRC]).as_py() or 0) if bad.num_rows else 0

    if bad.num_rows:
        _atomic_write_parquet(
            mf.rejects_path(lake_path, pid, group_id), bad.drop_columns([mg.NSRC])
        )

    delta = mg.resolve_lww(mg.with_run_seq(good, 0), drop_tombstones=False)
    delta = delta.drop_columns([mg.RUN_SEQ, mg.NSRC])
    _atomic_write_parquet(mf.delta_path(lake_path, pid, group_id), delta)

    ops = pc.fill_null(delta["op"], "insert")
    n_del = pc.sum(pc.cast(pc.equal(ops, "delete"), pa.int64())).as_py() or 0
    counters = {
        "rows_in": n_valid_src + n_bad_src,
        "valid": n_valid_src,
        "rejects": n_bad_src,
        "upserts": delta.num_rows - n_del,
        "deletes": n_del,
        "delta_bytes": delta.nbytes,
        "min_lsn": pc.min(good["lsn"]).as_py() if good.num_rows else None,
        "max_lsn": pc.max(good["lsn"]).as_py() if good.num_rows else None,
    }
    _write_manifest(lake_path, pid, group_id, new_epochs, counters)

    # opportunistic LSM compaction when read amplification grows
    if len(mf.delta_runs(lake_path, pid)) > max_delta_runs:
        _compact_partition(lake_path, pid, force=True)

    return _report_row(
        pid,
        skipped=False,
        rows_in=counters["rows_in"],
        rejects=n_bad_src,
        upserts=counters["upserts"],
        deletes=n_del,
    )


def _report_row(pid: int, *, skipped: bool, **counts) -> pa.Table:
    row = {
        "pid": [pid],
        "skipped": [skipped],
        "rows_in": [counts.get("rows_in", 0)],
        "rejects": [counts.get("rejects", 0)],
        "upserts": [counts.get("upserts", 0)],
        "deletes": [counts.get("deletes", 0)],
    }
    return pa.table(row)


def _write_manifest(lake_path, pid, group_id, epochs, counters) -> None:
    mf.atomic_write_json(
        mf.manifest_path(lake_path, pid, group_id),
        {"pid": pid, "group_id": group_id, "epochs": epochs, "counters": counters},
    )


def _atomic_write_parquet(path: str, table: pa.Table) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _partition_runs(lake_path: str, pid: int) -> list[pa.Table]:
    """Base + committed deltas, oldest first, as Arrow tables."""
    runs: list[pa.Table] = []
    base = mf.current_base(lake_path, pid)
    through = -1
    if base is not None:
        gen, path = base
        markers = {m["generation"]: m for m in mf.read_compact_markers(lake_path, pid)}
        through = markers.get(gen, {}).get("through_group", -1)
        runs.append(pq.read_table(path))
    for ep, path in mf.delta_runs(lake_path, pid):
        if ep > through:
            runs.append(pq.read_table(path))
    return runs


def _read_partition_state(lake_path: str, pid: int) -> pa.Table | None:
    runs = _partition_runs(lake_path, pid)
    if not runs:
        return None
    merged = mg.merge_runs(runs, drop_tombstones=True)
    return merged.drop_columns([c for c in ("op", "epoch") if c in merged.schema.names])


def _compact_partition(lake_path: str, pid: int, *, force: bool) -> bool:
    """Fold base + deltas into a new base generation; tombstones drop out.
    Idempotent: generation id = prior generation + 1; marker commits it."""
    deltas = mf.delta_runs(lake_path, pid)
    if not deltas and not force:
        return False
    runs = _partition_runs(lake_path, pid)
    if not runs:
        return False
    if len(runs) == 1 and not deltas:
        return False
    merged = mg.merge_runs(runs, drop_tombstones=True)
    base = mf.current_base(lake_path, pid)
    gen = (base[0] + 1) if base else 1
    through = max((ep for ep, _ in deltas), default=-1)
    if base is not None:
        markers = {m["generation"]: m for m in mf.read_compact_markers(lake_path, pid)}
        through = max(through, markers.get(base[0], {}).get("through_group", -1))
    _atomic_write_parquet(mf.base_path(lake_path, pid, gen), merged)
    mf.atomic_write_json(
        mf.compact_marker_path(lake_path, pid, gen),
        {"generation": gen, "through_group": through, "rows": merged.num_rows},
    )
    # best-effort cleanup of folded runs (manifests stay: they are the ledger)
    for ep, path in deltas:
        if ep <= through:
            try:
                os.remove(path)
            except OSError:
                pass
    if base is not None:
        try:
            os.remove(base[1])
        except OSError:
            pass
    return True
