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

    Stage A  (map over WAL row-group ranges, no exchange):
      one task per ~row-group-range of a segment file:
        read -> conform -> validate -> per-unit LWW pre-combine
        -> ONE indexed parquet file per unit, rows grouped by (pid,
           salt): lake/_staging/group-G/unit-<unit>.parquet with one row
           group per (pid, salt) run + an index of row-group ordinals
           (in-band to the driver + sidecar JSON).  One file per unit —
           not per (unit x partition) — avoids the map-side small-file
           explosion (M x N files) at 10^10 events.
      unit names are DETERMINISTIC per (group, epoch, file, range),
      written tmp+rename: a retried task atomically overwrites identical
      bytes (exactly-once without any coordination).

    [Stage A2, salt_shards > 1]  (map over (pid, salt), no exchange):
      parallel pre-merge of one hot partition's salt slice into a single
      combined fragment — the skew reducer: a conversation-heavy
      partition is collapsed by salt_shards tasks before the final merge.

    Stage B  (map over partition ids, no exchange):
      one task per lake partition: read that pid's staged fragments,
      drop already-committed epochs (resume), LWW-merge, write delta run
      + rejects + manifest (the commit point).

    driver: global epoch markers, then staging cleanup.

There is NO object-store all-to-all: the "shuffle" is the partitioned
staging write into the lake's storage (node-local disk here, S3/HDFS on
a real cluster) — the standard external-shuffle layout for CDC upsert
at the 10^10-event scale, where a sort-based exchange of the full text
payload would bottleneck the object store.  Per-unit pre-combine
collapses repeated writes to the same key before anything is staged.
State lives in the lake (base + delta runs per partition), never in
actor memory — tasks are stateless and retryable; the manifest is the
unit of truth.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
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


def hash_partition_ids(conv_id: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic (process-stable) hash partitioning of conv_id.

    Uses pandas' vectorized siphash with a fixed key — NOT Python
    ``hash()`` (salted per process, which would break resume).
    """
    arr = conv_id.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int32)


_worker_threads_set = False


def _ensure_worker_thread_limit() -> None:
    """Cap Arrow's internal thread pool inside Ray worker tasks.

    Each map task is scheduled as 1 CPU, but Arrow kernels
    (sort_indices/take/filter) default to a machine-wide pool — 30
    concurrent tasks x 32 Arrow threads oversubscribes the node ~30x.
    One Arrow thread per 1-CPU task keeps wall time ~= cpu time.
    """
    global _worker_threads_set
    if not _worker_threads_set:
        pa.set_cpu_count(max(1, int(os.environ.get("OMP_NUM_THREADS", "1"))))
        _worker_threads_set = True


_SORT_KEYS_EVENT = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("ts", "ascending"),
    ("lsn", "ascending"),
]


def _stage_plan(
    t: pa.Table, num_partitions: int, salt_shards: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """Compute the Stage-A routing plan *without touching the payload*.

    Works entirely on the 4 small key columns: validity, per-key LWW
    winner selection (the pre-shuffle combiner), partition/salt routing,
    and the (pid, salt)-grouped gather order.  Returns
    ``(final_idx, pid_sorted, salt_sorted, nsrc_sorted, bad_idx)`` so the
    caller can materialize winners with ONE take of the 2 KB-text rows.
    """
    mask = validate_mod.validity_mask(t).to_numpy(zero_copy_only=False).astype(bool)
    if mask.all():
        valid_idx = None
        keys = t.select(["conv_id", "turn_idx", "ts", "lsn"])
        bad_idx = None
    else:
        valid_idx = np.nonzero(mask)[0]
        bad_idx = np.nonzero(~mask)[0]
        keys = t.select(["conv_id", "turn_idx", "ts", "lsn"]).take(pa.array(valid_idx))
    if keys.num_rows == 0:
        return np.array([], np.int64), np.array([], np.int32), np.array([], np.int32), np.array([], np.int64), bad_idx
    order = pc.sort_indices(keys, sort_keys=_SORT_KEYS_EVENT)
    keys_sorted = keys.select(["conv_id", "turn_idx"]).take(order)
    wmask = mg._last_per_key_mask(keys_sorted)
    ends = np.nonzero(wmask)[0]
    starts = np.empty_like(ends)
    if len(ends):
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
    sizes = (ends - starts + 1).astype(np.int64)
    winners_local = order.to_numpy()[wmask]
    winners = valid_idx[winners_local] if valid_idx is not None else winners_local
    conv_w = keys["conv_id"].take(pa.array(winners_local))
    pid = hash_partition_ids(conv_w, num_partitions)
    if salt_shards > 1:
        salt = (
            keys["lsn"].take(pa.array(winners_local)).to_numpy(zero_copy_only=False)
            % salt_shards
        ).astype(np.int32)
    else:
        salt = np.zeros(len(winners), np.int32)
    forder = np.lexsort((salt, pid))
    return winners[forder], pid[forder], salt[forder], sizes[forder], bad_idx


def _named(fn, name: str):
    """map_groups requires a __name__; give a callable-class instance one
    without losing its per-call state."""
    def wrapped(group):
        return fn(group)

    wrapped.__name__ = name
    return wrapped


def _unit_name(u: dict) -> str:
    return f"e{u['epoch']:06d}-f{u['file_idx']:04d}-r{u['rg_lo']:05d}"


def _atomic_write_json_small(path: str, payload) -> None:
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def _read_unit_index(idx_path: str) -> dict:
    import json

    with open(idx_path) as f:
        return json.load(f)


class _StageUnits:
    """Stage A task: read one WAL row-group range, prepare, and write the
    rows split by (pid, salt) into deterministic staging fragments.

    This *is* the shuffle — a map-side partitioned write into lake
    storage instead of an object-store all-to-all.  Fragment paths are a
    pure function of (group, epoch, file, row-group range, pid, salt), so
    a retried or replayed task atomically rewrites identical fragments.
    """

    def __init__(
        self,
        staging_dir: str,
        target_schema_str: bytes | None,
        num_partitions: int,
        salt_shards: int,
    ):
        self.staging_dir = staging_dir
        # schemas don't pickle cheaply across many tasks; ship serialized
        self.target_schema = (
            pa.ipc.read_schema(pa.py_buffer(target_schema_str))
            if target_schema_str
            else None
        )
        self.num_partitions = num_partitions
        self.salt_shards = salt_shards

    def __call__(self, units: pa.Table) -> pa.Table:
        """Returns the unit's row-group index EXPLODED to one metadata
        row per (unit, pid, salt) slice — reject units marked pid = -1.
        The slice index therefore lives in the object store as ordinary
        Dataset rows and flows to Stage A2/B through a ``groupby``
        exchange; the driver never holds the O(units x partitions)
        consolidated map (at 10^10 events / 4096 partitions that map is
        ~10 GB of driver heap)."""
        _ensure_worker_thread_limit()
        import json

        out_pid, out_salt, out_unit, out_rgs = [], [], [], []
        for u in units.to_pylist():  # tiny descriptor rows, not a data loop
            pf = pq.ParquetFile(u["path"])
            t = pf.read_row_groups(list(range(u["rg_lo"], u["rg_hi"] + 1)))
            if self.target_schema is not None:
                t = mg.conform(t, self.target_schema)
            index, _ = self._write_fragments(t, u)
            name = _unit_name(u)
            for key, rgs in index.items():
                if key == "rej":
                    out_pid.append(-1)
                    out_salt.append(0)
                    out_unit.append(name)
                    out_rgs.append("rej")
                else:
                    p, s = key.split(":")
                    out_pid.append(int(p))
                    out_salt.append(int(s))
                    out_unit.append(name)
                    out_rgs.append(json.dumps(rgs))
        return pa.table(
            {
                "pid": pa.array(out_pid, pa.int32()),
                "salt": pa.array(out_salt, pa.int32()),
                "unit": pa.array(out_unit, pa.string()),
                "rgs_json": pa.array(out_rgs, pa.string()),
            }
        )

    def _write_fragments(self, t: pa.Table, u: dict) -> int:
        """Write ONE indexed parquet file per unit: rows sorted by
        (pid, salt), one row group per (pid, salt) run, plus a sidecar
        JSON index mapping "pid:salt" -> row-group ordinals.

        One file per unit — NOT one per (unit x partition) — is what
        survives scale: M units x N partitions of separate fragment
        files is the map-side shuffle small-file explosion (300M files
        at 10^10 events / 4096 partitions).  Merge tasks read only
        their row groups by ordinal, so I/O stays selective.  The index
        is written last (tmp+rename) and acts as the unit's commit
        marker; names are deterministic, so retries rewrite in place.
        """
        final_idx, pid_s, salt_s, nsrc_s, bad_idx = _stage_plan(
            t, self.num_partitions, self.salt_shards
        )
        name = _unit_name(u)
        os.makedirs(self.staging_dir, exist_ok=True)
        index: dict[str, list[int]] = {}
        nrg = 0
        if len(final_idx):
            # the ONE full-payload gather: winners, already (pid, salt)-grouped
            body = t.take(pa.array(final_idx))
            body = body.append_column(mg.NSRC, pa.array(nsrc_s, pa.int64()))
            changes = np.nonzero((np.diff(pid_s) != 0) | (np.diff(salt_s) != 0))[0]
            starts = np.concatenate([[0], changes + 1])
            ends = np.concatenate([changes + 1, [len(pid_s)]])
            path = os.path.join(self.staging_dir, f"unit-{name}.parquet")
            tmp = path + ".tmp"
            with pq.ParquetWriter(
                tmp,
                body.schema,
                use_dictionary=_dict_cols(body.schema),
                compression=_LAKE_CODEC,
            ) as w:
                for rg, (st, en) in enumerate(zip(starts, ends)):
                    w.write_table(body.slice(st, en - st), row_group_size=int(en - st))
                    index.setdefault(f"{int(pid_s[st])}:{int(salt_s[st])}", []).append(rg)
            os.replace(tmp, path)
            nrg = len(starts)
        if bad_idx is not None and len(bad_idx):
            # dead-letter rows: raw, uncombined, routed to partition 0
            bad = t.take(pa.array(bad_idx))
            _atomic_write_parquet(
                os.path.join(self.staging_dir, f"rej-{name}.parquet"), bad
            )
            index["rej"] = [len(bad_idx)]
        # index written last = the unit's atomic commit marker (sidecar is
        # for inspection/debugging; the authoritative copy travels in-band
        # through the Stage-A task output into the A1.5 groupby, which
        # consolidates it into per-pid index files — never onto the driver)
        _atomic_write_json_small(
            os.path.join(self.staging_dir, f"unit-{name}.idx.json"), index
        )
        return index, nrg


def _slice_index_path(staging_dir: str, pid: int, salt: int | None = None) -> str:
    if salt is None:
        return os.path.join(staging_dir, f"slices-p{pid:04d}.json")
    return os.path.join(staging_dir, f"slices-p{pid:04d}-s{salt:02d}.json")


def _rej_index_path(staging_dir: str) -> str:
    return os.path.join(staging_dir, "rej-units.json")


class _ConsolidateSliceIndex:
    """Stage A1.5 group task: fold Stage A's exploded slice-metadata rows
    into per-partition JSON index files inside the staging dir — the
    distributed replacement for the old driver-resident slice map (which
    was O(units x partitions): ~10 GB of driver heap at the 10^10-event /
    4096-partition target).

    Runs as ``groupby("pid").map_groups``: the sort exchange may pack
    several pids into one task (sampled boundaries collapse on duplicate
    keys), which is harmless here — each group only writes a tiny JSON
    file.  The HEAVY per-partition work (A2 pre-merge, Stage B merge)
    then fans out with exact one-task-per-partition parallelism, each
    task reading only its own index file."""

    def __init__(self, staging_dir: str, salt_shards: int):
        self.staging_dir = staging_dir
        self.salt_shards = salt_shards

    def __call__(self, group: pa.Table) -> pa.Table:
        import json

        pid = int(group["pid"][0].as_py())
        if pid < 0:  # dead-letter units, routed to partition 0 at merge time
            units = sorted(set(group["unit"].to_pylist()))
            _atomic_write_json_small(_rej_index_path(self.staging_dir), units)
            return pa.table(
                {"pid": pa.array([pid], pa.int32()), "entries": pa.array([len(units)], pa.int64())}
            )
        entries = sorted(
            (int(s), u, json.loads(rj))
            for s, u, rj in zip(
                group["salt"].to_pylist(),
                group["unit"].to_pylist(),
                group["rgs_json"].to_pylist(),
            )
        )
        if self.salt_shards > 1:
            for salt in sorted({s for s, _, _ in entries}):
                _atomic_write_json_small(
                    _slice_index_path(self.staging_dir, pid, salt),
                    [[u, rgs] for s, u, rgs in entries if s == salt],
                )
        else:
            _atomic_write_json_small(
                _slice_index_path(self.staging_dir, pid),
                [[u, rgs] for _, u, rgs in entries],
            )
        return pa.table(
            {"pid": pa.array([pid], pa.int32()), "entries": pa.array([len(entries)], pa.int64())}
        )


def _load_slice_index(path: str) -> list:
    import json

    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return []  # partition untouched by this group


def _read_slices(staging_dir: str, slices: list[tuple[str, list[int]]]) -> pa.Table | None:
    """Concat the given (unit name, row-group ordinals) slices."""
    tables = []
    for unit, rgs in slices:
        path = os.path.join(staging_dir, f"unit-{unit}.parquet")
        tables.append(pq.ParquetFile(path).read_row_groups(sorted(rgs)))
    return mg.concat_unified(tables) if tables else None


def _pre_path(staging_dir: str, pid: int, salt: int) -> str:
    return os.path.join(staging_dir, f"pre-p{pid:04d}-s{salt:02d}.parquet")


class _PreMergeSalts:
    """Stage A2 task (salt_shards > 1): collapse one (pid, salt) staging
    slice into a single pre-combined fragment — parallel skew reduction
    for conversation-heavy partitions before the per-pid merge.

    The pre-combine runs PER EPOCH (not across the whole group): a
    cross-epoch combine would sum ``_nsrc`` lineage weights across epoch
    boundaries, which breaks the per-epoch resume filter's row
    accounting when a later retry must drop already-committed epochs.
    Stage B's final resolve collapses the per-epoch winners anyway.
    """

    def __init__(self, staging_dir: str):
        self.staging_dir = staging_dir

    def __call__(self, pairs: pa.Table) -> pa.Table:
        """Per (pid, salt) descriptor row: read the pair's slice list from
        its A1.5 index file (never shipped through the driver) and
        pre-combine."""
        _ensure_worker_thread_limit()

        out = {"pid": [], "salt": [], "rows": []}
        for p in pairs.to_pylist():
            pid, salt = int(p["pid"]), int(p["salt"])
            slices = _load_slice_index(_slice_index_path(self.staging_dir, pid, salt))
            n = 0
            good = _read_slices(self.staging_dir, slices)
            if good is not None and good.num_rows:
                parts = []
                for e in sorted(pc.unique(good["epoch"]).to_pylist()):
                    sub = good.filter(pc.equal(good["epoch"], e))
                    sub = mg.resolve_lww(mg.with_run_seq(sub, 0), drop_tombstones=False)
                    parts.append(sub.drop_columns([mg.RUN_SEQ]))
                good = mg.concat_unified(parts)
                _atomic_write_parquet(_pre_path(self.staging_dir, pid, salt), good)
                n = good.num_rows
            out["pid"].append(pid)
            out["salt"].append(salt)
            out["rows"].append(n)
        return pa.table(out)


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


class LakeLockedError(RuntimeError):
    """Another writer holds the lake's apply/compact lease."""


class _LakeLease:
    """Single-writer lease for apply/compact (advisory lock file).

    Two concurrent applies would delete each other's staging dirs
    (``apply`` clears stale ``_staging/group-*``), so writes are guarded
    by ``<lake>/_lock.json`` created with O_EXCL.  A crashed writer's
    lock is stolen when its pid is dead (same host) or the lease is
    older than ``stale_after_s`` (the cross-host fallback a real cluster
    would replace with an object-store conditional put / DynamoDB lock,
    as Delta/Iceberg single-writer commits do).
    """

    def __init__(
        self, lake_path: str, stale_after_s: float = 3600.0, wait_s: float = 0.0
    ):
        self.path = os.path.join(lake_path, "_lock.json")
        self.stale_after_s = stale_after_s
        #: >0: poll for up to this long instead of failing fast —
        #: writer QUEUEING (a follow loop and a cron compaction can
        #: coexist without the operator sequencing them by hand).
        self.wait_s = wait_s

    def __enter__(self):
        import json

        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        deadline = time.time() + self.wait_s
        while True:
            payload = json.dumps({"pid": os.getpid(), "ts": time.time()})
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(payload)
                return self
            except FileExistsError:
                if self._is_stale():
                    try:  # steal the stale lock and retry the create
                        os.remove(self.path)
                    except FileNotFoundError:
                        pass
                    continue
                if time.time() < deadline:
                    time.sleep(0.1)
                    continue
                raise LakeLockedError(
                    f"lake is locked by another writer ({self.path}); "
                    "concurrent apply/compact is not allowed"
                ) from None

    def _is_stale(self) -> bool:
        import json

        try:
            with open(self.path) as f:
                held = json.load(f)
        except (OSError, ValueError):
            return True  # unreadable/corrupt lock: treat as stale
        if time.time() - float(held.get("ts", 0)) > self.stale_after_s:
            return True
        pid = held.get("pid")
        if isinstance(pid, int):
            try:
                os.kill(pid, 0)  # signal 0: existence check only
            except ProcessLookupError:
                return True
            except PermissionError:
                pass  # alive, owned by someone else
        return False

    def __exit__(self, *exc):
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass
        return False


class CdcEngine:
    def __init__(self, cfg: LakeConfig):
        """Open (or create) a lake.  Opening an existing lake with a
        config that disagrees on the physical routing constants raises —
        ``num_partitions``/``salt_shards`` decide where every key lives,
        so silently overwriting ``_lake.json`` would misroute all
        subsequent applies and break partition-pruned lookups."""
        if os.path.exists(cfg.meta_path):
            existing = LakeConfig.load(cfg.path)
            for attr in ("num_partitions", "salt_shards"):
                if getattr(existing, attr) != getattr(cfg, attr):
                    raise ValueError(
                        f"lake at {cfg.path} was created with "
                        f"{attr}={getattr(existing, attr)}, got {getattr(cfg, attr)}; "
                        "use LakeConfig.open_or_create / LakeConfig.load"
                    )
            self.cfg = cfg
        else:
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

    def _committed_groups(self) -> set[int]:
        d = os.path.join(self.cfg.path, "_epochs")
        if not os.path.isdir(d):
            return set()
        out = set()
        for name in os.listdir(d):
            if re.match(r"epoch-(\d{6})\.json$", name):
                try:
                    with open(os.path.join(d, name)) as f:
                        out.add(int(json.load(f)["group_id"]))
                except (OSError, KeyError, ValueError):
                    pass
        return out

    def _event_watermark(self, *, before_group: int) -> int | None:
        """Event-time high-water mark (max committed event ts, µs) over
        all groups committed BEFORE ``before_group`` — the lateness
        threshold handed to that group's merge tasks.  Served from the
        ``_watermark.json`` cache when it covers the committed ledger;
        otherwise folded from the partition manifests (authoritative),
        which is retry-deterministic because prior groups are fully
        committed under the single-writer lease."""
        committed = [g for g in self._committed_groups() if g < before_group]
        hi = max(committed, default=-1)
        try:
            with open(os.path.join(self.cfg.path, "_watermark.json")) as f:
                d = json.load(f)
            if int(d.get("through_group", -1)) == hi:
                w = d.get("watermark_us")
                return int(w) if w is not None else None
        except (OSError, ValueError):
            pass
        w: int | None = None
        for pid in self._live_pids():
            for m in mf.read_manifests(self.cfg.path, pid):
                if int(m["group_id"]) >= before_group:
                    continue
                v = m.get("counters", {}).get("max_ts_us")
                if v is not None:
                    w = int(v) if w is None else max(w, int(v))
        return w

    # ----------------------------------------------------------------- apply
    def apply(
        self,
        wal_dir: str,
        *,
        max_epochs: int | None = None,
        lease_wait_s: float = 0.0,
    ) -> ApplyReport:
        """Apply all (or the next ``max_epochs``) unapplied epochs as one
        Dataset pipeline run.  Idempotent: committed partition-epochs are
        skipped inside the apply tasks; a fully committed run is a no-op."""
        work = self.discover(wal_dir)
        if max_epochs is not None:
            work = work[:max_epochs]
        if not work:
            return ApplyReport(epochs=[])
        with _LakeLease(self.cfg.path, wait_s=lease_wait_s):
            return self._apply_locked(work)

    def _apply_locked(self, work) -> ApplyReport:
        epochs = [e for e, _ in work]
        files = [f for _, fs in work for f in fs]
        t0 = time.perf_counter()

        # schema evolution across epochs: unify per-epoch file schemas
        # (driver-side footer read, one file per epoch) and conform every
        # unit to the union before staging, so heterogeneous WAL segments
        # (added columns, widened ints) coexist in one run.
        epoch_schemas = [pq.read_schema(fs[0]) for _, fs in work]
        target_schema = schemas.unify(*epoch_schemas)

        group_id = max(epochs)
        staging_root = os.path.join(self.cfg.path, "_staging")
        staging_dir = os.path.join(staging_root, f"group-{group_id:06d}")
        # ALL stale staging is dead weight — including our own group's dir
        # from a crashed earlier attempt.  Stage B consumes slice/reject
        # index FILES and unit fragments from disk, so leftovers from an
        # attempt over a since-rewritten WAL segment (a pid or reject set
        # touched then but not now) would otherwise merge phantom rows;
        # wiping restores the old in-band invariant that a retry always
        # recomputes everything it reads.
        if os.path.isdir(staging_root):
            for name in os.listdir(staging_root):
                shutil.rmtree(os.path.join(staging_root, name), ignore_errors=True)

        trace = os.environ.get("CDC_TRACE") == "1"

        def _t(label, since):
            if trace:
                print(f"[cdc-trace] {label}: {time.perf_counter()-since:.2f}s", file=__import__('sys').stderr)
            return time.perf_counter()

        tt = time.perf_counter()
        # ---- Stage A: partitioned staging write (the map-side "shuffle")
        units = self._stage_units(work)
        tt = _t("unit-scan", tt)
        stage = _StageUnits(
            staging_dir,
            target_schema.serialize().to_pybytes(),
            self.cfg.num_partitions,
            self.cfg.salt_shards,
        )
        # Stage A's output is the exploded slice index — one metadata row
        # per (unit, pid, salt), reject units as pid = -1.  Stage A1.5
        # (chained onto the same execution) folds those rows into per-pid
        # index FILES via a groupby exchange, so the driver never holds
        # the consolidated O(units x partitions) map (~10 GB of Python
        # objects at the 10^10-event / 4096-partition target).  The sort
        # exchange may pack several pids into one A1.5 task (sampled
        # boundaries collapse on duplicate keys) — harmless, each group
        # just writes a tiny JSON; the heavy A2/B merges below keep exact
        # one-task-per-partition fan-out by reading those files.
        slice_rows = (
            rd.from_arrow(units)
            .repartition(units.num_rows)
            .map_batches(
                stage,
                batch_format="pyarrow",
                batch_size=None,
                num_cpus=self.cfg.task_cpus,
            )
            .materialize()
        )
        tt = _t("stage-A", tt)
        # coalesce the tiny metadata rows before the exchange: the sort's
        # cost is per-block task overhead, not data volume — ~128 MB of
        # metadata per block keeps the exchange a handful of tasks at any
        # scale (3e8 rows / ~10 GB at the 4096-partition target -> ~80
        # blocks; a few KB at test scale -> 1 block)
        n_meta_blocks = max(
            1,
            min(self.cfg.num_partitions, (slice_rows.size_bytes() or 0) // (128 << 20) + 1),
        )
        (
            slice_rows.repartition(n_meta_blocks)
            .groupby("pid")
            .map_groups(
                _named(
                    _ConsolidateSliceIndex(staging_dir, self.cfg.salt_shards),
                    "consolidate_slice_index",
                ),
                batch_format="pyarrow",
            )
            .count()
        )
        tt = _t("stage-A1.5", tt)

        # ---- Stage A2 (skew): parallel pre-merge of each (pid, salt) slice
        if self.cfg.salt_shards > 1:
            pairs = pa.table(
                {
                    "pid": pa.array(
                        [
                            p
                            for p in range(self.cfg.num_partitions)
                            for _ in range(self.cfg.salt_shards)
                        ],
                        pa.int32(),
                    ),
                    "salt": pa.array(
                        list(range(self.cfg.salt_shards)) * self.cfg.num_partitions,
                        pa.int32(),
                    ),
                }
            )
            (
                rd.from_arrow(pairs)
                .repartition(pairs.num_rows)
                .map_batches(
                    _PreMergeSalts(staging_dir),
                    batch_format="pyarrow",
                    batch_size=None,
                    num_cpus=self.cfg.task_cpus,
                )
                .take_all()
            )
            tt = _t("stage-A2", tt)

        # ---- Stage B: per-partition LWW merge + commit (one task per
        # partition; each task loads its own A1.5 slice-index file)
        # event-time watermark through all PRIOR committed groups — one
        # threshold for every partition of this group.  Deterministic on
        # retry: prior groups are fully committed under the lease, so the
        # recompute fallback sees the same manifests.
        late_threshold_us = self._event_watermark(before_group=group_id)
        merge = _MergePartitions(
            self.cfg.path,
            staging_dir,
            group_id,
            sorted(epochs),
            self.cfg.max_delta_runs,
            self.cfg.salt_shards,
            late_threshold_us,
        )
        pids = pa.table({"pid": pa.array(range(self.cfg.num_partitions), pa.int32())})
        reports = (
            rd.from_arrow(pids)
            .repartition(self.cfg.num_partitions)
            .map_batches(
                merge,
                batch_format="pyarrow",
                batch_size=None,
                num_cpus=self.cfg.task_cpus,
            )
            .take_all()
        )
        tt = _t("stage-B", tt)

        # global commit markers (driver-side, after every partition landed)
        for e in epochs:
            mf.atomic_write_json(
                os.path.join(self.cfg.path, "_epochs", f"epoch-{e:06d}.json"),
                {"epoch": e, "group_id": group_id, "partitions": len(reports)},
            )
        shutil.rmtree(staging_dir, ignore_errors=True)

        # advance the cached event-time watermark (cache only — the
        # manifests are authoritative; _event_watermark recomputes from
        # them whenever the cache lags the committed ledger)
        grp_max = max(
            (r["max_ts_us"] for r in reports if r.get("max_ts_us") is not None),
            default=None,
        )
        new_w = max(
            (w for w in (late_threshold_us, grp_max) if w is not None), default=None
        )
        if new_w is not None:
            mf.atomic_write_json(
                os.path.join(self.cfg.path, "_watermark.json"),
                {"watermark_us": int(new_w), "through_group": group_id},
            )
        tt = _t("commit+cleanup", tt)

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

    def _stage_units(self, work) -> pa.Table:
        """Split the WAL segment files of this run into row-group-aligned
        work units (driver-side footer metadata scan only)."""
        rows_per_unit = self.cfg.stage_unit_rows
        out = {"epoch": [], "path": [], "file_idx": [], "rg_lo": [], "rg_hi": []}
        for epoch, fs in work:
            for fi, path in enumerate(fs):
                md = pq.ParquetFile(path).metadata
                lo, acc = 0, 0
                for rg in range(md.num_row_groups):
                    acc += md.row_group(rg).num_rows
                    if acc >= rows_per_unit or rg == md.num_row_groups - 1:
                        out["epoch"].append(epoch)
                        out["path"].append(path)
                        out["file_idx"].append(fi)
                        out["rg_lo"].append(lo)
                        out["rg_hi"].append(rg)
                        lo, acc = rg + 1, 0
        return pa.table(
            {
                "epoch": pa.array(out["epoch"], pa.int32()),
                "path": pa.array(out["path"], pa.string()),
                "file_idx": pa.array(out["file_idx"], pa.int32()),
                "rg_lo": pa.array(out["rg_lo"], pa.int32()),
                "rg_hi": pa.array(out["rg_hi"], pa.int32()),
            }
        )

    # ----------------------------------------------------------- tail / lag
    def lag(self, wal_dir: str) -> dict:
        """Consumer-lag metrics vs the WAL head (the Kafka-lag analog,
        ``streaming/README.md`` throughput dashboard): unapplied epoch
        count/ids and the newest WAL epoch vs newest committed."""
        committed = self._global_committed()
        wal_epochs = []
        if os.path.isdir(wal_dir):
            for name in os.listdir(wal_dir):
                m = _EPOCH_DIR_RE.match(name)
                if m:
                    wal_epochs.append(int(m.group(1)))
        pending = sorted(e for e in wal_epochs if e not in committed)
        return {
            "wal_head": max(wal_epochs, default=None),
            "committed_head": max(committed, default=None),
            "epochs_behind": len(pending),
            "pending_epochs": pending,
        }

    def follow(
        self,
        wal_dir: str,
        *,
        poll_interval_s: float = 1.0,
        max_idle_polls: int = 3,
        epochs_per_apply: int | None = None,
        on_apply=None,
    ) -> list[ApplyReport]:
        """Tail the WAL: repeatedly apply newly arrived epochs until the
        log goes quiet for ``max_idle_polls`` polls (the micro-batch
        trigger loop analog, ``fraud_detector.py:306-310`` — epoch
        directories stand in for Kafka offsets; exactly-once commits make
        re-polling free)."""
        reports: list[ApplyReport] = []
        idle = 0
        while idle < max_idle_polls:
            rep = self.apply(wal_dir, max_epochs=epochs_per_apply)
            if rep.epochs:
                idle = 0
                reports.append(rep)
                if on_apply is not None:
                    on_apply(rep)
            else:
                idle += 1
                time.sleep(poll_interval_s)
        return reports

    # ------------------------------------------------------------ compaction
    def wal_gc(self, wal_dir: str) -> dict:
        """WAL retention: delete epoch directories the lake has fully
        committed (global ``_epochs`` markers — the same ledger
        ``discover`` diffs against), so the log's disk footprint tracks
        lag instead of history.  The Kafka-retention analog with an
        exactly-once twist: a committed epoch is a no-op on re-apply,
        so GC never changes replay semantics — it only reclaims bytes.
        Epochs at or above the first UNcommitted epoch are always kept
        (even if individually committed) so a resumable gap never loses
        its tail.  Returns ``{"removed": n, "kept": n}``."""
        done = self._global_committed()
        names = []
        for name in sorted(os.listdir(wal_dir)):
            m = _EPOCH_DIR_RE.match(name)
            if m:
                names.append((int(m.group(1)), name))
        removed = kept = 0
        for epoch, name in names:
            if epoch in done:
                shutil.rmtree(os.path.join(wal_dir, name), ignore_errors=True)
                removed += 1
            else:
                # first gap: keep everything from here on
                kept = len(names) - removed
                break
        else:
            kept = 0
        return {"removed": removed, "kept": kept}

    def compact(
        self,
        pids: list[int] | None = None,
        *,
        force: bool = True,
        drop_tombstones: bool = False,
    ) -> int:
        """Merge each partition's base + delta runs into a new base
        generation (LSM compaction).  Distributed: one Ray task per
        partition via map_batches over partition descriptors.

        Tombstones are RETAINED by default: the WAL carries out-of-order
        timestamps that cross epoch boundaries, so a delete's tombstone
        must keep masking any later-arriving event with an older
        ``(ts, lsn)`` for the same key.  Pass ``drop_tombstones=True``
        only for a full compaction when the WAL is known complete (no
        epoch can still deliver an older write) — the event-time
        watermark decision belongs to the operator, not the engine.
        """
        pids = pids if pids is not None else self._live_pids()
        if not pids:
            return 0
        lake_path = self.cfg.path

        with _LakeLease(self.cfg.path):

            row_group_rows = getattr(self.cfg, "base_row_group_rows", BASE_ROW_GROUP_ROWS)

            def compact_one(batch: pa.Table) -> pa.Table:
                done = []
                for pid in batch["pid"].to_pylist():
                    done.append(
                        _compact_partition(
                            lake_path,
                            int(pid),
                            force=force,
                            drop_tombstones=drop_tombstones,
                            row_group_rows=row_group_rows,
                        )
                    )
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
    def snapshot(
        self, columns: list[str] | None = None, *, as_of_epoch: int | None = None
    ) -> rd.Dataset:
        """The lake's current state as a Dataset (one merge task per
        partition; fully-compacted partitions are a plain columnar read).

        ``as_of_epoch`` time-travels: the returned state is what the
        lake held right after that epoch's commit group (manifests are
        the ledger; deltas newer than the target are simply not read).
        Raises if the target predates the compaction watermark or falls
        inside a multi-epoch commit group.

        Output rows are unique on (conv_id, turn_idx) and sorted by that
        key *within* each partition — the stable turn ordering the
        equality oracle requires is obtained with a final global sort by
        the caller when needed.
        """
        pids = self._live_pids()
        lake_path = self.cfg.path
        if not pids:
            return rd.from_arrow(
                schemas.empty_state()
            )

        def read_one(batch: pa.Table) -> pa.Table:
            parts = [
                _read_partition_state(lake_path, int(pid), as_of_epoch)
                for pid in batch["pid"].to_pylist()
            ]
            parts = [p for p in parts if p is not None and p.num_rows]
            if not parts:
                return schemas.empty_state()
            out = mg.concat_unified(parts)
            if columns:
                out = out.select([c for c in columns if c in out.schema.names])
            return out

        ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
        return ds.repartition(len(pids)).map_batches(
            read_one, batch_format="pyarrow", batch_size=None
        )

    def snapshot_table(
        self, columns: list[str] | None = None, *, as_of_epoch: int | None = None
    ) -> pa.Table:
        """Materialized, globally key-sorted snapshot (tests / small lakes)."""
        batches = [
            b
            for b in self.snapshot(columns=columns, as_of_epoch=as_of_epoch).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if b.num_rows
        ]
        if not batches:
            return schemas.empty_state()
        t = mg.concat_unified([pa.table(b) if isinstance(b, dict) else b for b in batches])
        return mg.sort_by_key(t)

    def changes(
        self, *, after_epoch: int = -1, through_epoch: int | None = None
    ) -> rd.Dataset:
        """Change data feed: the committed per-group delta runs with
        commit group in ``(after_epoch, through_epoch]`` as one Dataset,
        ``op`` retained (upserts AND tombstones) and each row tagged
        with its ``change_group`` — the incremental-consumer surface: a
        downstream sync reads only what changed since its last watermark
        instead of re-scanning snapshots.  Raises if the window reaches
        below a partition's compaction watermark (those deltas were
        folded into the base — re-sync from a snapshot) or if a window
        edge cuts through a multi-epoch commit group."""
        pids = self._live_pids()
        lake_path = self.cfg.path
        feed_schema = pa.schema(
            [("lsn", pa.int64()), ("op", pa.string())]
            + list(schemas.TRANSCRIPT_SCHEMA)
            + [("change_group", pa.int32())]
        )
        if not pids:
            return rd.from_arrow(
                pa.table({f.name: pa.array([], f.type) for f in feed_schema})
            )

        def read_changes(batch: pa.Table) -> pa.Table:
            outs = []
            for pid in batch["pid"].to_pylist():
                pid = int(pid)
                base = mf.current_base(lake_path, pid)
                through_g = -1
                if base is not None:
                    markers = {
                        m["generation"]: m for m in mf.read_compact_markers(lake_path, pid)
                    }
                    through_g = markers.get(base[0], {}).get("through_group", -1)
                if after_epoch < through_g:
                    raise ValueError(
                        f"changes after epoch {after_epoch} of partition {pid} were "
                        f"folded into the base (compaction watermark {through_g}); "
                        "re-sync from a snapshot"
                    )
                for m in mf.read_manifests(lake_path, pid):
                    eps = m.get("epochs") or [m["group_id"]]
                    lo, hi = min(eps), max(eps)
                    for edge in (after_epoch, through_epoch):
                        if edge is not None and lo <= edge < hi:
                            raise ValueError(
                                f"epoch {edge} falls inside commit group "
                                f"{m['group_id']} (epochs {sorted(eps)}); the "
                                "change feed is commit-group-granular"
                            )
                for ep, path in mf.delta_runs(lake_path, pid):
                    if ep > after_epoch and (through_epoch is None or ep <= through_epoch):
                        t = pq.read_table(path)
                        t = t.drop_columns(
                            [c for c in (mg.NSRC, mg.RUN_SEQ) if c in t.schema.names]
                        )
                        outs.append(
                            t.append_column(
                                "change_group",
                                pa.array(np.full(t.num_rows, ep, np.int32)),
                            )
                        )
            outs = [o for o in outs if o.num_rows]
            if not outs:
                return pa.table({f.name: pa.array([], f.type) for f in feed_schema})
            return mg.concat_unified(outs)

        ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
        return ds.repartition(len(pids)).map_batches(
            read_changes, batch_format="pyarrow", batch_size=None
        )

    def rejects(
        self, *, after_epoch: int = -1, through_epoch: int | None = None
    ) -> rd.Dataset:
        """Dead-letter feed: the validation rejects of committed commit
        groups in ``(after_epoch, through_epoch]`` as one Dataset, each
        row tagged with its ``reject_group`` and a vectorized
        first-failing-rule ``reason`` (stages/validate.py) — the
        queryable analog of the reference's log-and-drop invalid-trip
        handling (``streaming/api/main.py`` returns 422s that vanish;
        here every reject is addressable for replay after a fix).

        Rejects files are committed by the same manifest as their
        group's delta (exactly-once: replaying a committed epoch never
        duplicates them) and are NEVER folded by compaction, so the
        full audit history stays readable regardless of the lake's
        compaction watermark.
        """
        pids = self._live_pids()
        lake_path = self.cfg.path
        feed_schema = pa.schema(
            [("reject_group", pa.int32()), ("reason", pa.string())]
            + list(schemas.EVENT_SCHEMA)
        )

        def read_rejects(batch: pa.Table) -> pa.Table:
            outs = []
            for pid in batch["pid"].to_pylist():
                pid = int(pid)
                for m in mf.read_manifests(lake_path, pid):
                    g = int(m["group_id"])
                    if g <= after_epoch or (through_epoch is not None and g > through_epoch):
                        continue
                    path = mf.rejects_path(lake_path, pid, g)
                    if not os.path.exists(path):
                        continue
                    t = pq.read_table(path)
                    t = t.drop_columns(
                        [c for c in (mg.NSRC, mg.RUN_SEQ) if c in t.schema.names]
                    )
                    t = t.append_column(
                        "reject_group", pa.array(np.full(t.num_rows, g, np.int32))
                    ).append_column(
                        "reason", pa.array(validate_mod.reject_reasons(t), pa.string())
                    )
                    outs.append(t)
            outs = [o for o in outs if o.num_rows]
            if not outs:
                return pa.table({f.name: pa.array([], f.type) for f in feed_schema})
            return mg.concat_unified(outs)

        if not pids:
            return rd.from_arrow(
                pa.table({f.name: pa.array([], f.type) for f in feed_schema})
            )
        ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
        return ds.repartition(len(pids)).map_batches(
            read_rejects, batch_format="pyarrow", batch_size=None
        )

    def diff(self, *, from_epoch: int, to_epoch: int | None = None) -> rd.Dataset:
        """Before/after-image change classification between two committed
        snapshots: every key whose LWW winner differs between the state
        as of ``from_epoch`` and the state as of ``to_epoch`` (default:
        current), tagged ``insert`` / ``update`` / ``delete`` with both
        images.  This is the Debezium-style enriched feed ``changes()``
        deliberately omits (the raw feed ships new values only): rather
        than burden the hot apply path with before-image capture, the
        images are derived on demand from the LSM runs themselves.

        Partition-local and shuffle-free — both states of a key live in
        the same partition, so each Ray task merges one partition twice
        and joins the two states vectorized.  Inherits ``snapshot()``'s
        time-travel constraints: raises below the compaction watermark
        or inside a multi-epoch commit group.
        """
        pids = self._live_pids()
        lake_path = self.cfg.path
        if not pids:
            return rd.from_arrow(_empty_diff())

        def diff_one(batch: pa.Table) -> pa.Table:
            outs = [
                _diff_states(
                    _read_partition_state(lake_path, int(pid), from_epoch),
                    _read_partition_state(lake_path, int(pid), to_epoch),
                )
                for pid in batch["pid"].to_pylist()
            ]
            outs = [o for o in outs if o.num_rows]
            if not outs:
                return _empty_diff()
            return pa.concat_tables(outs)

        ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
        return ds.repartition(len(pids)).map_batches(
            diff_one, batch_format="pyarrow", batch_size=None
        )

    # -------------------------------------------------- derived WAL epochs
    def _next_wal_epoch(self, wal_dir: str) -> int:
        """Next free epoch number in a WAL directory (max present + 1,
        also past anything already committed to this lake)."""
        present = [-1]
        if os.path.isdir(wal_dir):
            for name in os.listdir(wal_dir):
                m = _EPOCH_DIR_RE.match(name)
                if m:
                    present.append(int(m.group(1)))
        committed = self._global_committed()
        if committed:
            present.append(max(committed))
        return max(present) + 1

    def _emit_derived_epoch(
        self, wal_dir: str, rows: rd.Dataset, *, op: str, ts, lsn: int
    ) -> int | None:
        """Write a Dataset of payload rows into ``wal_dir`` as a new WAL
        epoch of ``op`` events, stamped with one (ts, lsn) chosen by the
        caller to win LWW against the rows being corrected/retired.
        The epoch directory appears atomically (tmp dir + rename), so a
        crash mid-write never leaves a half epoch that ``discover``
        would replay.  Returns the epoch number, or None if ``rows`` was
        empty (no epoch created)."""
        epoch = self._next_wal_epoch(wal_dir)
        ts_us = int(pd.Timestamp(ts).value // 1000)

        def stamp(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                "lsn": pa.array(np.full(n, lsn, np.int64)),
                "op": pa.array(np.full(n, op)),
                "epoch": pa.array(np.full(n, epoch, np.int32), pa.int32()),
            }
            for name in t.schema.names:
                if name not in ("lsn", "op", "epoch", "ts"):
                    cols[name] = t[name]
            cols["ts"] = pa.array(
                np.full(n, ts_us, np.int64).view("datetime64[us]"),
                pa.timestamp("us"),
            )
            # the ingest gate expects the full base envelope (tombstones
            # carry keys only) — null-fill what the caller didn't supply
            for f in schemas.TRANSCRIPT_SCHEMA:
                if f.name not in cols:
                    cols[f.name] = pa.nulls(n, f.type)
            return pa.table(cols)

        return self._write_epoch_dir(
            wal_dir, rows.map_batches(stamp, batch_format="pyarrow"), epoch
        )

    @staticmethod
    def _write_epoch_dir(wal_dir: str, stamped: rd.Dataset, epoch: int) -> int | None:
        """Write fully-stamped WAL rows as ``wal_dir/epoch=NNNNNN``,
        atomically (tmp dir + rename); None if the Dataset was empty."""
        tmp = os.path.join(wal_dir, f".tmp-epoch-{epoch:06d}")
        shutil.rmtree(tmp, ignore_errors=True)
        stamped.write_parquet(tmp)
        files = (
            [f for f in os.listdir(tmp) if f.endswith(".parquet")]
            if os.path.isdir(tmp)  # a zero-row write creates nothing
            else []
        )
        n_rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows for f in files)
        if n_rows == 0:
            shutil.rmtree(tmp, ignore_errors=True)
            return None
        final = os.path.join(wal_dir, f"epoch={epoch:06d}")
        os.rename(tmp, final)
        return epoch

    def export_changes_as_wal(
        self,
        out_wal_dir: str,
        *,
        after_epoch: int = -1,
        through_epoch: int | None = None,
        target: "CdcEngine | None" = None,
        epoch: int | None = None,
    ) -> int | None:
        """Cross-lake replication bridge: export the change feed as ONE
        WAL epoch another :class:`CdcEngine` can ``apply``.  Delta runs
        are already per-(key, group) LWW winners with winning tombstones
        retained and each row keeps its original (ts, lsn), so replaying
        the whole window as a single epoch reproduces this lake's end
        state on the target — the key with the greatest (ts, lsn) wins
        there exactly as it did here.  Pair with :meth:`checksum` on
        both sides to verify convergence without moving rows again.
        Incremental: run per consumer watermark window; rows stream
        straight from the feed Dataset into the target's WAL files.

        Epoch numbering: the exported epoch must be new TO THE TARGET —
        a number the target's committed ledger already contains would
        make its ``apply`` silently skip the data (possible after
        ``wal_gc`` of the feed dir, or when two sources replicate into
        one target).  Pass ``target`` (the consuming engine) so the
        number is derived from the TARGET's committed ledger plus the
        feed-dir contents, or supply a monotone ``epoch`` yourself
        (e.g. a replication watermark).  Without either, the fallback
        uses the feed dir plus this SOURCE's ledger — correct only for
        the single-source, un-gc'd-feed topology."""
        feed = self.changes(after_epoch=after_epoch, through_epoch=through_epoch)
        if epoch is None:
            if target is not None:
                present = [-1]
                if os.path.isdir(out_wal_dir):
                    for name in os.listdir(out_wal_dir):
                        m = _EPOCH_DIR_RE.match(name)
                        if m:
                            present.append(int(m.group(1)))
                committed = target._global_committed()
                if committed:
                    present.append(max(committed))
                epoch = max(present) + 1
            else:
                epoch = self._next_wal_epoch(out_wal_dir)

        def stamp(t: pa.Table) -> pa.Table:
            drop = [c for c in ("change_group", "epoch") if c in t.schema.names]
            if drop:
                t = t.drop_columns(drop)
            return t.append_column(
                "epoch", pa.array(np.full(t.num_rows, epoch, np.int32), pa.int32())
            )

        os.makedirs(out_wal_dir, exist_ok=True)
        return self._write_epoch_dir(
            out_wal_dir, feed.map_batches(stamp, batch_format="pyarrow"), epoch
        )

    def backfill(
        self, wal_dir: str, fn, *, ts, lsn: int = 1 << 60
    ) -> tuple[int | None, "ApplyReport"]:
        """Bulk correction THROUGH the CDC path: run ``fn`` (an Arrow
        batch transform: rows in, corrected rows out — return only the
        rows to rewrite) over the current snapshot, emit the result as
        one new epoch of ``op='update'`` events stamped at ``ts`` (which
        must exceed every corrected row's current ts), and apply it via
        the normal exactly-once machinery.  The correction is therefore
        replayable, time-travelable (the pre-backfill state stays
        reachable via ``as_of_epoch``), visible in ``changes()``, and
        crash-safe — none of which an in-place rewrite of lake files
        would give.  The reference's analog is a full dbt re-run; this
        touches only the corrected keys' partitions at merge time.
        """
        upd = self.snapshot().map_batches(fn, batch_format="pyarrow")
        epoch = self._emit_derived_epoch(wal_dir, upd, op="update", ts=ts, lsn=lsn)
        return epoch, self.apply(wal_dir)

    def purge(
        self, wal_dir: str, *, older_than, lsn: int = 1 << 60
    ) -> tuple[int | None, "ApplyReport"]:
        """Retention (TTL) delete through the CDC path: tombstone every
        key whose current winner ``ts`` is older than ``older_than``.
        Tombstones are stamped at exactly ``older_than`` (a purged row's
        ts is strictly smaller, so the tombstone wins; anything at or
        after the cutoff is untouched even if a concurrent writer races
        the purge).  Deletion is logical and auditable — ``changes()``
        shows the tombstones, ``as_of_epoch`` still reads the pre-purge
        state — and ``compact()`` later reclaims the space physically.
        """
        cutoff = pd.Timestamp(older_than)
        cutoff_us = int(cutoff.value // 1000)

        def expired(t: pa.Table) -> pa.Table:
            keep = pc.less(
                pc.cast(t["ts"], pa.int64()), pa.scalar(cutoff_us, pa.int64())
            )
            return t.filter(pc.fill_null(keep, False))

        dead = self.snapshot(columns=["conv_id", "turn_idx", "ts"]).map_batches(
            expired, batch_format="pyarrow"
        )
        epoch = self._emit_derived_epoch(wal_dir, dead, op="delete", ts=cutoff, lsn=lsn)
        return epoch, self.apply(wal_dir)

    def checksum(
        self, columns: list[str] | None = None, *, as_of_epoch: int | None = None
    ) -> dict:
        """Order-independent content checksum of the lake state — the
        anti-entropy / replication-verification primitive: two replicas
        (or a replica and an independent reimplementation) can be
        compared by exchanging ONE 64-bit digest instead of rows.

        XOR of per-row 64-bit md5 digests over a canonical row encoding
        (each field length-prefixed as ``<charlen>:<value>``, fields
        '|'-joined, nulls as '', timestamps as epoch microseconds; the
        length prefix makes the encoding injective across column
        boundaries — ('a|b','c') and ('a','b|c') encode differently,
        the same guarantee ``state/derived._key_of`` uses).  XOR is a
        commutative monoid, so each partition folds its own rows
        locally and the driver folds ~P partials — no row ever moves,
        and the result is independent of partition count, merge order,
        and compaction state.  Mirrors the SQL
        ``bit_xor(md5_number_lower(concat_ws('|', length(v) || ':' ||
        v, ...)))`` exactly (the per-row md5 is a Python loop — no
        Arrow md5 kernel — like the fingerprint op; at 10^10 rows swap
        in a vectorized 128-bit hash on both sides).
        """
        cols = columns or [f.name for f in schemas.TRANSCRIPT_SCHEMA]
        snap = self.snapshot(columns=cols, as_of_epoch=as_of_epoch)

        def part(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return pa.table(
                    {"x": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
                )
            x = _fold_md5_xor(_canon_rows(t, cols))
            return pa.table(
                {
                    "x": pa.array([np.int64(x.view(np.int64))], pa.int64()),
                    "n": pa.array([n], pa.int64()),
                }
            )

        parts = snap.map_batches(part, batch_format="pyarrow").to_pandas()
        x = np.uint64(0)
        for v in parts["x"].to_numpy(np.int64):
            x ^= np.int64(v).view(np.uint64)
        return {"rows": int(parts["n"].sum()), "checksum": int(np.int64(x.view(np.int64)))}

    def export_snapshot(
        self, out_dir: str, *, as_of_epoch: int | None = None
    ) -> dict:
        """Exactly-once snapshot EXPORT — the external-sink analog of
        the lake's own commit protocol: one Parquet file per lake
        partition written tmp+rename, then an atomic ``_SUCCESS``
        marker carrying the content checksum.  Re-running against an
        unchanged lake is a NO-OP (marker checksum matches — nothing is
        rewritten); after new commits the export rewrites and
        re-commits.  A crashed export leaves no marker (any previous
        marker is REMOVED before part files are touched, so a torn
        rewrite can never hide behind a stale ``_SUCCESS``), consumers
        never see a partial snapshot, and the retry simply overwrites
        deterministic bytes — the resumable-output contract
        (per-partition files, never one giant file).  The lake's
        single-writer lease is held for the duration, so the marker
        checksum is computed over exactly the partition states the part
        files were exported from (no apply/compact can interleave
        between the checksum pass and the per-partition reads)."""
        with _LakeLease(self.cfg.path):
            return self._export_snapshot_locked(out_dir, as_of_epoch)

    def _export_snapshot_locked(self, out_dir: str, as_of_epoch) -> dict:
        cs = self.checksum(as_of_epoch=as_of_epoch)
        marker = os.path.join(out_dir, "_SUCCESS")
        try:
            with open(marker) as f:
                prev = json.load(f)
            if prev.get("checksum") == cs["checksum"] and prev.get("rows") == cs["rows"]:
                return {"skipped": True, **cs}
        except (OSError, ValueError):
            pass
        os.makedirs(out_dir, exist_ok=True)
        # invalidate FIRST: from here until the new marker lands, readers
        # must treat the directory as uncommitted (crash-mid-rewrite would
        # otherwise leave the old marker over a mix of old and new parts)
        try:
            os.remove(marker)
        except OSError:
            pass
        lake_path = self.cfg.path
        pids = self._live_pids()

        def export_one(batch: pa.Table) -> pa.Table:
            out_pid, out_rows = [], []
            for pid in batch["pid"].to_pylist():
                pid = int(pid)
                state = _read_partition_state(lake_path, pid, as_of_epoch)
                if state is None:
                    state = schemas.empty_state()
                keep = [
                    c
                    for c in state.schema.names
                    if c not in (*schemas.INTERNAL_COLUMNS, mg.NSRC)
                ]
                _atomic_write_parquet(
                    os.path.join(out_dir, f"part-p{pid:04d}.parquet"),
                    state.select(keep),
                )
                out_pid.append(pid)
                out_rows.append(state.num_rows)
            return pa.table(
                {
                    "pid": pa.array(out_pid, pa.int32()),
                    "rows": pa.array(out_rows, pa.int64()),
                }
            )

        if pids:
            ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
            ds.repartition(len(pids)).map_batches(
                export_one, batch_format="pyarrow", batch_size=None
            ).count()
        # drop part files from a previous export with MORE partitions
        # (e.g. exporting a resharded lake into the same directory) —
        # stale files must not pollute a glob-reading consumer
        want = {f"part-p{pid:04d}.parquet" for pid in pids}
        for name in os.listdir(out_dir):
            if name.startswith("part-p") and name.endswith(".parquet") and name not in want:
                try:
                    os.remove(os.path.join(out_dir, name))
                except OSError:
                    pass
        mf.atomic_write_json(
            marker, {"checksum": cs["checksum"], "rows": cs["rows"], "as_of_epoch": as_of_epoch}
        )
        return {"skipped": False, **cs}

    def reshard(self, target_path: str, num_partitions: int) -> "CdcEngine":
        """Scale-out (or -in) repartitioning: rewrite the lake at a new
        partition count — the operation a 10^10-event lake needs when
        the partition count chosen at creation stops fitting the
        cluster (hot partitions outgrow worker heaps, or 4096
        partitions starve a 16-node cluster of parallelism).  The
        reference has no analog (Snowflake hides physical layout); for
        an explicit-layout lake this is as fundamental as compaction.

        Two distributed stages, both embarrassingly parallel:

        1. one task per SOURCE partition merges its runs (tombstones
           RETAINED — they must keep masking late out-of-order events
           after the move, exactly as in compaction) and splits the
           rows by ``hash(conv_id) % new_N`` into per-target fragment
           files (tmp-named, atomic);
        2. one task per TARGET partition concatenates its fragments —
           no re-merge needed: each key lived in exactly one source
           partition and arrives already LWW-resolved, keys from
           different sources are disjoint — key-sorts, and writes a
           generation-1 base with bloom sidecar, compact marker, and a
           bootstrap manifest carrying the source's applied-epoch
           ledger.

        The target lake then behaves like a freshly-compacted lake at
        the same watermark: ``discover``/``apply`` skip the already
        applied epochs (the global ``_epochs`` markers are copied) and
        later WAL epochs apply under the new partitioning; history
        below the watermark reads as compacted-away (time travel /
        change feed re-sync from a snapshot, the documented LSM
        horizon).  Reject/audit history stays with the source lake.
        Convergence is checkable with :meth:`checksum`, which is
        partition-layout invariant by construction."""
        if os.path.exists(os.path.join(target_path, "_lake.json")):
            raise ValueError(f"target lake already exists: {target_path}")
        # _lake.json is written LAST (below) and _RESHARDING is dropped FIRST,
        # so "_RESHARDING present, _lake.json absent" identifies a crashed
        # previous reshard: wipe the leftovers so the retry rebuilds from
        # scratch instead of mixing generations.  A non-empty directory
        # WITHOUT the marker is someone else's data — refuse to clobber it.
        in_progress = os.path.join(target_path, "_RESHARDING")
        if os.path.isdir(target_path) and os.listdir(target_path):
            if not os.path.exists(in_progress):
                raise ValueError(
                    f"target path is non-empty and not a crashed reshard: {target_path}"
                )
            shutil.rmtree(target_path)
        os.makedirs(target_path, exist_ok=True)
        with open(in_progress, "w") as f:
            f.write("reshard in progress\n")
        src = self.cfg
        tgt_cfg = LakeConfig(
            path=target_path,
            num_partitions=num_partitions,
            max_delta_runs=src.max_delta_runs,
            salt_shards=src.salt_shards,
            batch_size=src.batch_size,
            stage_unit_rows=src.stage_unit_rows,
            task_cpus=src.task_cpus,
            base_row_group_rows=getattr(src, "base_row_group_rows", BASE_ROW_GROUP_ROWS),
        )
        with _LakeLease(src.path):
            applied = sorted(self._global_committed())
            watermark = applied[-1] if applied else -1
            src_pids = self._live_pids()
            lake_path = src.path
            stage_dir = os.path.join(target_path, "_reshard")
            os.makedirs(stage_dir, exist_ok=True)
            row_group_rows = tgt_cfg.base_row_group_rows

            def split_one(batch: pa.Table) -> pa.Table:
                out_pid, out_rows = [], []
                for pid in batch["pid"].to_pylist():
                    pid = int(pid)
                    runs = _partition_runs(lake_path, pid)
                    if not runs:
                        continue
                    state = mg.merge_runs(runs, drop_tombstones=False)
                    tpids = hash_partition_ids(state["conv_id"], num_partitions)
                    for t in np.unique(tpids):
                        frag = state.take(pa.array(np.flatnonzero(tpids == t)))
                        _atomic_write_parquet(
                            os.path.join(
                                stage_dir, f"t={int(t):04d}-src={pid:04d}.parquet"
                            ),
                            frag,
                        )
                    out_pid.append(pid)
                    out_rows.append(state.num_rows)
                return pa.table(
                    {
                        "pid": pa.array(out_pid, pa.int32()),
                        "rows": pa.array(out_rows, pa.int64()),
                    }
                )

            ds = rd.from_arrow(pa.table({"pid": pa.array(src_pids, pa.int32())}))
            ds.repartition(max(len(src_pids), 1)).map_batches(
                split_one, batch_format="pyarrow", batch_size=None
            ).count()

            def build_one(batch: pa.Table) -> pa.Table:
                out_pid, out_rows = [], []
                for t in batch["pid"].to_pylist():
                    t = int(t)
                    frags = sorted(
                        glob.glob(os.path.join(stage_dir, f"t={t:04d}-src=*.parquet"))
                    )
                    parts = [pq.read_table(f) for f in frags]
                    parts = [p for p in parts if p.num_rows]
                    if not parts:
                        # nothing hashed here: the partition dir is
                        # created lazily by the first apply that hits it
                        continue
                    base = mg.sort_by_key(mg.concat_unified(parts)).combine_chunks()
                    _atomic_write_parquet(
                        mf.base_path(target_path, t, 1),
                        base,
                        row_group_rows=row_group_rows,
                    )
                    _write_bloom(mf.base_path(target_path, t, 1), base["conv_id"])
                    mf.atomic_write_json(
                        mf.compact_marker_path(target_path, t, 1),
                        {
                            "generation": 1,
                            "through_group": watermark,
                            "rows": base.num_rows,
                        },
                    )
                    live = (
                        base.filter(pc.not_equal(base["op"], "delete")).num_rows
                        if "op" in base.schema.names
                        else base.num_rows
                    )
                    mf.atomic_write_json(
                        mf.manifest_path(target_path, t, watermark if watermark >= 0 else 0),
                        {
                            "pid": t,
                            "group_id": watermark if watermark >= 0 else 0,
                            "epochs": applied or [0],
                            "counters": {
                                "rows_in": int(base.num_rows),
                                "upserts": int(live),
                                "deletes": int(base.num_rows - live),
                                "rejects": 0,
                                # preserve the event-time watermark across
                                # the move: the max-ts row always wins its
                                # key, so max over retained winners == max
                                # over all valid source rows
                                "max_ts_us": pc.max(
                                    pc.cast(base["ts"], pa.int64())
                                ).as_py(),
                            },
                            "resharded_from": src.path,
                        },
                    )
                    out_pid.append(t)
                    out_rows.append(base.num_rows)
                return pa.table(
                    {
                        "pid": pa.array(out_pid, pa.int32()),
                        "rows": pa.array(out_rows, pa.int64()),
                    }
                )

            tds = rd.from_arrow(
                pa.table({"pid": pa.array(list(range(num_partitions)), pa.int32())})
            )
            tds.repartition(num_partitions).map_batches(
                build_one, batch_format="pyarrow", batch_size=None
            ).count()

            src_epochs = os.path.join(src.path, "_epochs")
            tgt_epochs = os.path.join(target_path, "_epochs")
            if os.path.isdir(src_epochs):
                os.makedirs(tgt_epochs, exist_ok=True)
                for name in os.listdir(src_epochs):
                    shutil.copyfile(
                        os.path.join(src_epochs, name), os.path.join(tgt_epochs, name)
                    )
            shutil.rmtree(stage_dir, ignore_errors=True)
            # completion marker LAST: an interrupted reshard leaves no
            # _lake.json, so it can't pass for a healthy lake and the retry's
            # crashed-attempt sweep (above, keyed on _RESHARDING) cleans it
            # up automatically.
            tgt_cfg.save()
            os.unlink(in_progress)
        return CdcEngine(tgt_cfg)

    def key_history(self, conv_id: str) -> pa.Table:
        """Forensic key lineage: every event for one conversation still
        physically present in the lake (base + live delta runs), with
        its origin ``epoch``, ``op``, and an ``is_winner`` flag per
        turn under the engine's LWW order — the "why does this turn
        have this text" audit a CDC operator reaches for before
        blaming the source.  Partition- and row-group-pruned like
        :meth:`get_conversation`; history below the compaction
        watermark has been folded away (only each turn's winner
        survives a fold), the same horizon every LSM lake has."""
        pid = int(
            hash_partition_ids(pa.array([conv_id], pa.string()), self.cfg.num_partitions)[0]
        )

        def _collect() -> list[pa.Table]:
            outs = []
            for path in _partition_run_paths(self.cfg.path, pid):
                t, _, _ = _read_run_pruned(path, [conv_id])
                if t is not None and t.num_rows:
                    outs.append(
                        t.drop_columns(
                            [c for c in (mg.NSRC, mg.RUN_SEQ) if c in t.schema.names]
                        )
                    )
            return outs

        # one retry on the reader-vs-compactor unlink race (cf. _partition_runs)
        try:
            outs = _collect()
        except FileNotFoundError:
            outs = _collect()
        if not outs:
            return pa.table(
                {
                    f.name: pa.array([], f.type)
                    for f in list(schemas.TRANSCRIPT_SCHEMA)
                }
            ).append_column("is_winner", pa.array([], pa.bool_()))
        hist = mg.concat_unified(outs)
        ti = hist["turn_idx"].to_numpy(zero_copy_only=False)
        ts = pc.cast(hist["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        lsn = hist["lsn"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lsn, ts, ti))
        last_per_turn = np.zeros(len(order), bool)
        sorted_ti = ti[order]
        last_per_turn[-1] = True
        last_per_turn[:-1] = sorted_ti[1:] != sorted_ti[:-1]
        winners = np.zeros(len(order), bool)
        winners[order] = last_per_turn
        hist = hist.append_column("is_winner", pa.array(winners))
        return hist.take(pa.array(order))

    def checksum_partitions(self) -> dict[int, dict]:
        """Per-partition content digests — the Merkle level below
        :meth:`checksum`: two same-layout lakes (a replica pair, or
        source and `reshard` target at equal partition counts) compare
        P small digests and drill into ONLY the partitions that
        disagree, instead of shipping rows.  One Ray task per
        partition, same row encoding as the global checksum (which
        equals the XOR of these)."""
        cols = [f.name for f in schemas.TRANSCRIPT_SCHEMA]
        lake_path = self.cfg.path
        pids = self._live_pids()
        if not pids:
            return {}

        def one(batch: pa.Table) -> pa.Table:
            out_pid, out_x, out_n = [], [], []
            for pid in batch["pid"].to_pylist():
                state = _read_partition_state(lake_path, int(pid))
                x = np.uint64(0)
                n = 0
                if state is not None and state.num_rows:
                    n = state.num_rows
                    x = _fold_md5_xor(_canon_rows(state, cols))
                out_pid.append(int(pid))
                out_x.append(np.int64(x.view(np.int64)))
                out_n.append(n)
            return pa.table(
                {
                    "pid": pa.array(out_pid, pa.int32()),
                    "x": pa.array(out_x, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                }
            )

        ds = rd.from_arrow(pa.table({"pid": pa.array(pids, pa.int32())}))
        df = (
            ds.repartition(len(pids))
            .map_batches(one, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        return {
            int(r.pid): {"checksum": int(r.x), "rows": int(r.n)}
            for r in df.itertuples()
        }

    def antientropy_diff(self, other: "CdcEngine") -> pa.Table:
        """Merkle-style anti-entropy between two SAME-LAYOUT lakes:
        compare per-partition digests, then compute before/after key
        diffs ONLY for the partitions that disagree (partition-local,
        one Ray task each; agreeing partitions ship one int).  Returns
        the :data:`DIFF_SCHEMA` table of keys whose LWW winner differs
        (``before`` = this lake, ``after`` = other) — the repair
        worklist replication (``export_changes_as_wal``) or a targeted
        backfill then closes.  The divergence-detection primitive every
        multi-region lake pair needs."""
        if self.cfg.num_partitions != other.cfg.num_partitions:
            raise ValueError(
                "anti-entropy diff needs equal partition layouts; reshard "
                f"first ({self.cfg.num_partitions} != {other.cfg.num_partitions})"
            )
        mine = self.checksum_partitions()
        theirs = other.checksum_partitions()
        stale = sorted(
            pid
            for pid in set(mine) | set(theirs)
            if mine.get(pid) != theirs.get(pid)
        )
        if not stale:
            return _empty_diff()
        a_path, b_path = self.cfg.path, other.cfg.path

        def diff_one(batch: pa.Table) -> pa.Table:
            outs = [
                _diff_states(
                    _read_partition_state(a_path, int(pid)),
                    _read_partition_state(b_path, int(pid)),
                )
                for pid in batch["pid"].to_pylist()
            ]
            outs = [o for o in outs if o.num_rows]
            return pa.concat_tables(outs) if outs else _empty_diff()

        ds = rd.from_arrow(pa.table({"pid": pa.array(stale, pa.int32())}))
        batches = [
            b if isinstance(b, pa.Table) else pa.table(b)
            for b in ds.repartition(len(stale))
            .map_batches(diff_one, batch_format="pyarrow", batch_size=None)
            .iter_batches(batch_format="pyarrow")
        ]
        t = pa.concat_tables(batches or [_empty_diff()], promote_options="default")
        return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

    def get_conversation(self, conv_id: str) -> pa.Table:
        """Point lookup: one conversation's current turns, in order.

        Partition-pruned — hashes ``conv_id`` to its lake partition and
        merges ONLY that partition's runs (the lake-side analog of the
        reference's per-key Redis reads); never scans the other
        ``num_partitions - 1`` partitions.
        """
        pid = int(
            hash_partition_ids(pa.array([conv_id], pa.string()), self.cfg.num_partitions)[0]
        )
        out, _, _ = _read_keys_pruned(self.cfg.path, pid, [conv_id])
        if out is None:
            return schemas.empty_state()
        return out.take(pc.sort_indices(out, sort_keys=[("turn_idx", "ascending")]))

    def get_conversations(self, conv_ids) -> rd.Dataset:
        """Bulk point lookup, partition- AND row-group-pruned: hashes
        the requested keys to their owning partitions and reads ONLY
        those — a lake with 10 000 partitions serving a 50-conversation
        lookup merges at most 50 partitions, and each task receives
        just the key subset it owns (no full request list broadcast).
        Within a partition, compacted bases are key-sorted with bounded
        row groups, so footer min/max stats narrow the read to the
        O(keys) groups that can hold the requested conversations
        (``_read_keys_pruned``) instead of scanning the partition.
        Rows come back (conv_id, turn_idx)-sorted within each
        partition, like :meth:`snapshot`."""
        ids = sorted(set(conv_ids))
        lake_path = self.cfg.path
        if not ids:
            return rd.from_arrow(
                schemas.empty_state()
            )
        pids = hash_partition_ids(pa.array(ids, pa.string()), self.cfg.num_partitions)
        live = set(self._live_pids())
        by_pid: dict[int, list[str]] = {}
        for cid, pid in zip(ids, pids):
            if int(pid) in live:
                by_pid.setdefault(int(pid), []).append(cid)
        if not by_pid:
            return rd.from_arrow(
                schemas.empty_state()
            )

        def read_keys(batch: pa.Table) -> pa.Table:
            outs = []
            for pid, keys in zip(batch["pid"].to_pylist(), batch["keys"].to_pylist()):
                hit, _, _ = _read_keys_pruned(lake_path, int(pid), list(keys))
                if hit is not None and hit.num_rows:
                    outs.append(hit)
            if not outs:
                return schemas.empty_state()
            return mg.concat_unified(outs)

        work = pa.table(
            {
                "pid": pa.array(list(by_pid), pa.int32()),
                "keys": pa.array(list(by_pid.values()), pa.list_(pa.string())),
            }
        )
        return (
            rd.from_arrow(work)
            .repartition(work.num_rows)
            .map_batches(read_keys, batch_format="pyarrow", batch_size=None)
        )

    # --------------------------------------------------------------- metrics
    def describe(self) -> dict:
        """Physical lake statistics from parquet FOOTERS only (no data
        read): per-partition base generation, delta-run count, rows and
        bytes — the ``SHOW TABLE``/ops surface a lake operator reads
        before deciding to compact or re-shard."""
        parts = []
        for pid in self._live_pids():
            entry = {"pid": pid, "base_generation": None, "base_rows": 0,
                     "delta_runs": 0, "delta_rows": 0, "bytes": 0}
            base = mf.current_base(self.cfg.path, pid)
            if base is not None:
                gen, path = base
                entry["base_generation"] = gen
                entry["base_rows"] = pq.ParquetFile(path).metadata.num_rows
                entry["bytes"] += os.path.getsize(path)
            for _, path in mf.delta_runs(self.cfg.path, pid):
                entry["delta_runs"] += 1
                entry["delta_rows"] += pq.ParquetFile(path).metadata.num_rows
                entry["bytes"] += os.path.getsize(path)
            parts.append(entry)
        return {
            "partitions": len(parts),
            "total_rows": sum(p["base_rows"] + p["delta_rows"] for p in parts),
            "total_bytes": sum(p["bytes"] for p in parts),
            "max_delta_runs": max((p["delta_runs"] for p in parts), default=0),
            "per_partition": parts,
        }

    def fsck(self) -> dict:
        """Lake integrity audit from manifests + parquet footers (no
        data read) — the recovery-time question "is every committed
        epoch actually on disk, and does the ledger add up?":

        - ``missing_delta``: a manifest commits a group whose delta
          parquet is gone AND was not folded into the base (real loss);
        - ``row_mismatch``: a live delta's footer row count differs
          from its manifest's ``upserts + deletes`` lineage;
        - ``orphan_base``: a base parquet without its compact marker
          (crashed compaction — ignored by readers, reclaimable);
        - ``orphan_delta``: a delta parquet without a manifest (crashed
          apply — invisible to readers, reclaimable);
        - ``tmp_file``: leftover ``*.tmp`` from an interrupted atomic
          write (reclaimable).

        ``ok`` is True iff no REAL issues (missing_delta/row_mismatch);
        orphans and tmps are listed as reclaimable, not failures —
        exactly-once means a crashed writer may leave them behind by
        design."""
        issues: list[dict] = []
        reclaimable: list[dict] = []
        for pid in self._live_pids():
            d = mf.partition_dir(self.cfg.path, pid)
            base = mf.current_base(self.cfg.path, pid)
            through = -1
            if base is not None:
                markers = {m["generation"]: m for m in mf.read_compact_markers(self.cfg.path, pid)}
                through = markers.get(base[0], {}).get("through_group", -1)
            committed = {}
            for m in mf.read_manifests(self.cfg.path, pid):
                committed[int(m["group_id"])] = m
            for g, m in committed.items():
                path = mf.delta_path(self.cfg.path, pid, g)
                c = m.get("counters", {})
                expected = int(c.get("upserts", 0)) + int(c.get("deletes", 0))
                if not os.path.exists(path):
                    if g > through and expected > 0:
                        issues.append({"kind": "missing_delta", "pid": pid, "group": g})
                    continue
                rows = pq.ParquetFile(path).metadata.num_rows
                if rows != expected:
                    issues.append(
                        {
                            "kind": "row_mismatch",
                            "pid": pid,
                            "group": g,
                            "footer_rows": rows,
                            "ledger_rows": expected,
                        }
                    )
            for name in os.listdir(d):
                full = os.path.join(d, name)
                if name.endswith(".tmp"):
                    reclaimable.append({"kind": "tmp_file", "pid": pid, "file": name})
                elif name.startswith("delta-") and name.endswith(".parquet"):
                    g = int(name[6:-8])
                    if g not in committed:
                        reclaimable.append(
                            {"kind": "orphan_delta", "pid": pid, "group": g}
                        )
                elif name.startswith("base-") and name.endswith(".parquet"):
                    gen = int(name[5:-8])
                    if not os.path.exists(mf.compact_marker_path(self.cfg.path, pid, gen)):
                        reclaimable.append(
                            {"kind": "orphan_base", "pid": pid, "generation": gen}
                        )
        return {
            "ok": not issues,
            "issues": issues,
            "reclaimable": reclaimable,
            "partitions": len(self._live_pids()),
        }

    def vacuum(self) -> dict:
        """Delete the crash remnants :meth:`fsck` classifies as
        reclaimable — orphan deltas/bases (no commit marker: invisible
        to every reader) and ``*.tmp`` files.  Never touches committed
        state, so it is safe concurrent with readers; run it after
        crash recovery or on a janitor schedule."""
        rep = self.fsck()
        removed = 0
        for r in rep["reclaimable"]:
            pid = r["pid"]
            if r["kind"] == "tmp_file":
                path = os.path.join(mf.partition_dir(self.cfg.path, pid), r["file"])
            elif r["kind"] == "orphan_delta":
                path = mf.delta_path(self.cfg.path, pid, r["group"])
            else:  # orphan_base
                path = mf.base_path(self.cfg.path, pid, r["generation"])
            try:
                os.remove(path)
                removed += 1
            except OSError:
                pass
        return {"removed": removed, "had_issues": not rep["ok"]}

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
        # keep-last-K alert ring (the capped Redis fraud-alert list analog)
        counters["recent_rejects"] = mf.merge_alert_ring(all_manifests)
        return counters


# ---------------------------------------------------------------- task bodies


class _MergePartitions:
    """Stage B task: one call per lake partition — read the pid's staged
    fragments, LWW-merge, and commit a delta run (exactly-once via the
    manifest protocol, see state/manifest.py docstring)."""

    def __init__(
        self,
        lake_path: str,
        staging_dir: str,
        group_id: int,
        epochs: list[int],
        max_delta_runs: int,
        salt_shards: int,
        late_threshold_us: int | None = None,
    ):
        self.lake_path = lake_path
        self.staging_dir = staging_dir
        self.group_id = group_id
        self.epochs = epochs
        self.max_delta_runs = max_delta_runs
        self.salt_shards = salt_shards
        self.late_threshold_us = late_threshold_us

    def __call__(self, pids: pa.Table) -> pa.Table:
        """Per partition descriptor row: slice list and dead-letter unit
        list come from the A1.5 index files in the staging dir (never
        shipped through the driver).  Rejects route to partition 0."""
        _ensure_worker_thread_limit()

        rows = []
        for p in pids.to_pylist():
            pid = int(p["pid"])
            slices = (
                [] if self.salt_shards > 1  # B reads the pre-merged files
                else [tuple(e) for e in _load_slice_index(_slice_index_path(self.staging_dir, pid))]
            )
            rejs = _load_slice_index(_rej_index_path(self.staging_dir)) if pid == 0 else []
            rows.append(self._merge_one(pid, slices, rejs))
        return pa.concat_tables(rows)

    def _read_staged(
        self, pid: int, slices: list, rej_units: list[str]
    ) -> tuple[pa.Table | None, pa.Table | None]:
        """(combined valid rows with _nsrc, raw reject rows)."""
        if self.salt_shards > 1:
            paths = [
                _pre_path(self.staging_dir, pid, s)
                for s in range(self.salt_shards)
            ]
            tables = [pq.read_table(p) for p in paths if os.path.exists(p)]
            good = mg.concat_unified(tables) if tables else None
        else:
            good = _read_slices(self.staging_dir, slices)
        bad = None
        if rej_units:
            bad = mg.concat_unified(
                [
                    pq.read_table(os.path.join(self.staging_dir, f"rej-{u}.parquet"))
                    for u in rej_units
                ]
            )
        return good, bad

    def _merge_one(self, pid: int, slices: list, rej_units: list[str]) -> pa.Table:
        good, bad = self._read_staged(pid, slices, rej_units)
        return _apply_partition_group(
            good,
            bad,
            pid,
            self.lake_path,
            self.group_id,
            set(self.epochs),
            self.max_delta_runs,
            self.late_threshold_us,
        )


def _epoch_filter(t: pa.Table | None, new_epochs: list[int]) -> pa.Table | None:
    if t is None:
        return None
    # a retry after partial commit: only count/apply uncommitted epochs
    return t.filter(
        pc.is_in(t["epoch"], value_set=pa.array(new_epochs, t["epoch"].type))
    )


def _apply_partition_group(
    good: pa.Table | None,
    bad: pa.Table | None,
    pid: int,
    lake_path: str,
    group_id: int,
    epoch_set: set[int],
    max_delta_runs: int,
    late_threshold_us: int | None = None,
) -> pa.Table:
    already = mf.committed_epoch_groups(lake_path, pid)
    new_epochs = sorted(e for e in epoch_set if e not in already)
    if not new_epochs:
        # retry of a committed group: surface the committed watermark so
        # the driver's post-commit fold still sees every partition
        prev = {}
        try:
            with open(mf.manifest_path(lake_path, pid, group_id)) as f:
                prev = json.load(f).get("counters", {})
        except OSError:
            pass
        return _report_row(pid, skipped=True, max_ts_us=prev.get("max_ts_us"))
    good = _epoch_filter(good, new_epochs)
    bad = _epoch_filter(bad, new_epochs)
    if (good is None or good.num_rows == 0) and (bad is None or bad.num_rows == 0):
        # still record the commit so this partition never re-scans the epoch
        _write_manifest(lake_path, pid, group_id, new_epochs, counters={"rows_in": 0})
        return _report_row(pid, skipped=False)
    if good is None:
        good = pa.table(
            {
                f.name: pa.array([], f.type)
                for f in (bad.schema if bad is not None else schemas.EVENT_SCHEMA)
            }
        ).append_column(mg.NSRC, pa.array([], pa.int64()))

    # exact lineage despite the pre-shuffle combiner: _nsrc sums source rows
    n_valid_src = int(pc.sum(good[mg.NSRC]).as_py() or 0) if good.num_rows else 0
    n_bad_src = bad.num_rows if bad is not None else 0

    alerts: list[dict] = []
    if bad is not None and bad.num_rows:
        _atomic_write_parquet(mf.rejects_path(lake_path, pid, group_id), bad)
        alerts = _alert_ring_entries(bad, mf.ALERT_RING_K)

    delta = mg.resolve_lww(mg.with_run_seq(good, 0), drop_tombstones=False)
    delta = delta.drop_columns([mg.RUN_SEQ, mg.NSRC])
    _atomic_write_parquet(mf.delta_path(lake_path, pid, group_id), delta)

    ops = pc.fill_null(delta["op"], "insert")
    n_del = pc.sum(pc.cast(pc.equal(ops, "delete"), pa.int64())).as_py() or 0
    # event-time watermark: max ts survives the pre-shuffle combiner
    # exactly (the max-ts row is the LWW winner of its own key), so this
    # equals the max over all valid SOURCE rows routed here.  min would
    # not (a losing duplicate's ts is dropped), so no min_ts counter.
    max_ts_us = (
        pc.max(pc.cast(good["ts"], pa.int64())).as_py() if good.num_rows else None
    )
    # late-data accounting vs the lake's event-time watermark BEFORE this
    # group (driver-computed, same threshold for every partition): delta
    # rows that arrived with event time at or below it.  Deterministic
    # under retry — prior groups are fully committed, so the threshold
    # recomputes identically.
    late = 0
    if late_threshold_us is not None and delta.num_rows:
        late = (
            pc.sum(
                pc.cast(
                    pc.less_equal(
                        pc.cast(delta["ts"], pa.int64()),
                        pa.scalar(late_threshold_us, pa.int64()),
                    ),
                    pa.int64(),
                )
            ).as_py()
            or 0
        )
    counters = {
        "rows_in": n_valid_src + n_bad_src,
        "valid": n_valid_src,
        "rejects": n_bad_src,
        "upserts": delta.num_rows - n_del,
        "deletes": n_del,
        "delta_bytes": delta.nbytes,
        "min_lsn": pc.min(good["lsn"]).as_py() if good.num_rows else None,
        "max_lsn": pc.max(good["lsn"]).as_py() if good.num_rows else None,
        "max_ts_us": max_ts_us,
        "late_upserts": late,
    }
    _write_manifest(lake_path, pid, group_id, new_epochs, counters, alerts=alerts)

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
        max_ts_us=max_ts_us,
    )


def _report_row(pid: int, *, skipped: bool, **counts) -> pa.Table:
    row = {
        "pid": [pid],
        "skipped": [skipped],
        "rows_in": [counts.get("rows_in", 0)],
        "rejects": [counts.get("rejects", 0)],
        "upserts": [counts.get("upserts", 0)],
        "deletes": [counts.get("deletes", 0)],
        "max_ts_us": pa.array([counts.get("max_ts_us")], pa.int64()),
    }
    return pa.table(row)


def _alert_ring_entries(bad: pa.Table, k: int) -> list[dict]:
    """The K most recent reject rows as compact alert descriptors — the
    manifest-resident analog of the reference's capped Redis alert list
    (``fraud_detector.py:76-77`` lpush + ltrim 0..99).  Stored per
    partition-epoch manifest and merged keep-last-K at read time
    (:func:`state.manifest.merge_alert_ring`), so replays never
    double-push."""
    idx = pc.sort_indices(
        bad.select(["ts", "lsn"]),
        sort_keys=[("ts", "descending"), ("lsn", "descending")],
        null_placement="at_end",
    )
    top = bad.take(idx.slice(0, min(k, bad.num_rows)))
    reasons = validate_mod.reject_reasons(top)
    ts_us = pc.cast(top["ts"], pa.int64()).to_pylist()
    return [
        {
            "ts": ts_us[i],
            "lsn": top["lsn"][i].as_py(),
            "conv_id": top["conv_id"][i].as_py(),
            "turn_idx": top["turn_idx"][i].as_py(),
            "reason": reasons[i],
        }
        for i in range(top.num_rows)
    ]


def _write_manifest(lake_path, pid, group_id, epochs, counters, alerts=None) -> None:
    payload = {"pid": pid, "group_id": group_id, "epochs": epochs, "counters": counters}
    if alerts:
        payload["alerts"] = alerts
    mf.atomic_write_json(mf.manifest_path(lake_path, pid, group_id), payload)


def _dict_cols(schema: pa.Schema) -> list[str]:
    """Dictionary-encode only the low-cardinality string columns.
    Building a dictionary over the ~unique 2 KB ``text`` payloads is
    pure overhead (~20% of write time measured) — the page falls back
    to plain encoding anyway."""
    return [c for c in ("conv_id", "role", "tool", "op", "model") if c in schema.names]


#: rows per row group in compacted base files.  Bases are key-sorted, so
#: bounded groups give footer min/max stats real selectivity: a point
#: lookup reads O(keys) groups of a multi-GB partition, not the file.
#: 64k rows x ~2 KB text ~ 128 MB per group.
BASE_ROW_GROUP_ROWS = 65536


#: codec for every lake-owned parquet file (staging fragments, deltas,
#: bases, rejects, exports).  LZ4 over the default snappy: measured on
#: the WAL-shaped payload (200k rows / 218 MB of ~2 KB texts), lz4
#: reads 2.2x faster (0.23 s vs 0.52 s) at +15% file size — staging is
#: written once and read once, bases are read by every snapshot/query,
#: so decode speed dominates storage.  (Uncompressed is ~40% faster
#: still on round-trip CPU but 2.8x the bytes — wrong at 100 TB where
#: staging IO shares disks/network with the object store.)
_LAKE_CODEC = "lz4"


def _atomic_write_parquet(
    path: str, table: pa.Table, *, row_group_rows: int | None = None
) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(
        table,
        tmp,
        use_dictionary=_dict_cols(table.schema),
        compression=_LAKE_CODEC,
        **({"row_group_size": row_group_rows} if row_group_rows else {}),
    )
    os.replace(tmp, path)


def _partition_runs(
    lake_path: str, pid: int, as_of_epoch: int | None = None
) -> list[pa.Table]:
    """Reader-vs-compactor race guard: a concurrent ``compact()`` may
    fold the runs this reader just listed (old base/deltas unlinked
    after the new generation's marker lands).  The ledger is always
    consistent, so one re-list + re-read sees the post-compaction
    layout; state equality is guaranteed because compaction preserves
    merged content.  One retry suffices — a second loss means a second
    full compaction cycle inside one read, i.e. misuse."""
    try:
        return _partition_runs_once(lake_path, pid, as_of_epoch)
    except FileNotFoundError:
        return _partition_runs_once(lake_path, pid, as_of_epoch)


def _partition_runs_once(
    lake_path: str, pid: int, as_of_epoch: int | None = None
) -> list[pa.Table]:
    """Base + committed deltas, oldest first, as Arrow tables.

    ``as_of_epoch`` time-travels to the state after that epoch's commit:
    delta groups are named by their max epoch, so a group is included
    iff ``group_id <= as_of_epoch``.  Raises if the target falls inside
    a multi-epoch commit group (no mid-group state ever existed) or
    below the compaction watermark (that history has been folded away —
    the retention horizon of any LSM lake)."""
    runs: list[pa.Table] = []
    base = mf.current_base(lake_path, pid)
    through = -1
    if base is not None:
        gen, path = base
        markers = {m["generation"]: m for m in mf.read_compact_markers(lake_path, pid)}
        through = markers.get(gen, {}).get("through_group", -1)
        if as_of_epoch is not None and through > as_of_epoch:
            raise ValueError(
                f"as_of_epoch={as_of_epoch} predates partition {pid}'s compaction "
                f"watermark (folded through group {through}); that history was "
                "compacted away"
            )
    if as_of_epoch is not None:
        # groups folded into the base (<= through) are history, not
        # snapshot candidates — only live groups can straddle the target
        for m in mf.read_manifests(lake_path, pid):
            eps = m.get("epochs") or [m["group_id"]]
            if m["group_id"] > through and min(eps) <= as_of_epoch < max(eps):
                raise ValueError(
                    f"as_of_epoch={as_of_epoch} falls inside commit group "
                    f"{m['group_id']} (epochs {sorted(eps)}) of partition {pid}; "
                    "snapshots exist only at commit-group boundaries"
                )
    if base is not None:
        runs.append(pq.read_table(base[1]))
    for ep, path in mf.delta_runs(lake_path, pid):
        if ep > through and (as_of_epoch is None or ep <= as_of_epoch):
            runs.append(pq.read_table(path))
    return runs


#: Output row of :meth:`CdcEngine.diff` — one row per key whose LWW
#: winner changed, with both images of the representative payload.
DIFF_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("change", pa.string()),
        ("before_text", pa.string()),
        ("after_text", pa.string()),
        ("before_role", pa.string()),
        ("after_role", pa.string()),
        ("before_ts", pa.timestamp("us")),
        ("after_ts", pa.timestamp("us")),
        ("before_lsn", pa.int64()),
        ("after_lsn", pa.int64()),
    ]
)


def _empty_diff() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in DIFF_SCHEMA})


def _diff_states(a: pa.Table | None, b: pa.Table | None) -> pa.Table:
    """Classify key-level changes between two merged partition states.

    Vectorized outer join on the merge key; a key changed iff its
    winning ``(ts, lsn)`` differs — the LWW ordering key identifies the
    winning event, so equal (ts, lsn) means the very same row won both
    times (duplicates were already collapsed by the merge).
    """
    cols = ["conv_id", "turn_idx", "text", "role", "ts", "lsn"]

    def frame(t: pa.Table | None) -> pd.DataFrame:
        if t is None or t.num_rows == 0:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        return t.select(cols).to_pandas()

    m = frame(a).merge(
        frame(b),
        on=["conv_id", "turn_idx"],
        how="outer",
        suffixes=("_a", "_b"),
        indicator=True,
    )
    ins = (m["_merge"] == "right_only").to_numpy()
    dele = (m["_merge"] == "left_only").to_numpy()
    both = (m["_merge"] == "both").to_numpy()
    upd = both & (
        (m["ts_a"].to_numpy() != m["ts_b"].to_numpy())
        | (m["lsn_a"].to_numpy() != m["lsn_b"].to_numpy())
    )
    keep = ins | dele | upd
    m = m[keep]
    change = np.where(
        (m["_merge"] == "right_only").to_numpy(),
        "insert",
        np.where((m["_merge"] == "left_only").to_numpy(), "delete", "update"),
    )
    def col(s: pd.Series, typ: pa.DataType) -> pa.Array:
        # outer-merge NaN padding: route through nullable dtypes so
        # missing-side images become Arrow nulls, not float garbage
        if pa.types.is_integer(typ):
            s = pd.to_numeric(s).astype("Int64")
        elif pa.types.is_timestamp(typ):
            s = pd.to_datetime(s)
        return pa.Array.from_pandas(s, type=typ)

    return pa.table(
        {
            "conv_id": col(m["conv_id"], pa.string()),
            "turn_idx": col(m["turn_idx"], pa.int32()),
            "change": pa.array(change, pa.string()),
            "before_text": col(m["text_a"], pa.string()),
            "after_text": col(m["text_b"], pa.string()),
            "before_role": col(m["role_a"], pa.string()),
            "after_role": col(m["role_b"], pa.string()),
            "before_ts": col(m["ts_a"], pa.timestamp("us")),
            "after_ts": col(m["ts_b"], pa.timestamp("us")),
            "before_lsn": col(m["lsn_a"], pa.int64()),
            "after_lsn": col(m["lsn_b"], pa.int64()),
        }
    )


def _canon_rows(t: pa.Table, cols: list[str]):
    """Canonical INJECTIVE row encoding shared by :meth:`CdcEngine.checksum`
    and :meth:`CdcEngine.checksum_partitions`: each field rendered as
    ``<charlen>:<value>`` (nulls as ``0:``, timestamps as epoch
    microseconds), fields joined with '|'.  The length prefix makes the
    encoding injective across column boundaries — without it
    ``('a|b','c')`` and ``('a','b|c')`` collide, so two divergent
    replicas could checksum equal (same construction as
    ``state/derived._key_of`` and the SQL oracle's
    ``length(v) || ':' || v``)."""
    n = t.num_rows
    pieces = []
    for c in cols:
        col = t[c] if c in t.schema.names else pa.nulls(n, pa.string())
        if pa.types.is_timestamp(col.type):
            col = pc.cast(pc.cast(col, pa.int64()), pa.string())
        elif not pa.types.is_string(col.type) and not pa.types.is_large_string(
            col.type
        ):
            col = pc.cast(col, pa.string())
        col = pc.fill_null(col, "")
        col = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(col), pa.string()), col, ":"
        )
        pieces.append(col)
    enc = pieces[0]
    for p in pieces[1:]:
        enc = pc.binary_join_element_wise(enc, p, "|")
    return enc


def _fold_md5_xor(enc) -> np.uint64:
    """XOR-fold little-endian uint64 of md5(row)[8:16] over encoded rows
    (== DuckDB ``bit_xor(md5_number_lower(...))``)."""
    import hashlib

    x = np.uint64(0)
    for s in enc.to_pylist():
        x ^= np.frombuffer(hashlib.md5(s.encode()).digest()[8:], dtype=np.uint64)[0]
    return x


def _read_partition_state(
    lake_path: str, pid: int, as_of_epoch: int | None = None
) -> pa.Table | None:
    runs = _partition_runs(lake_path, pid, as_of_epoch)
    if not runs:
        return None
    merged = mg.merge_runs(runs, drop_tombstones=True)
    return merged.drop_columns(
        [c for c in schemas.INTERNAL_COLUMNS if c in merged.schema.names]
    )


def _partition_run_paths(lake_path: str, pid: int) -> list[str]:
    """Current base + committed delta paths, oldest first (the file list
    ``_partition_runs`` reads, without reading them)."""
    paths: list[str] = []
    base = mf.current_base(lake_path, pid)
    through = -1
    if base is not None:
        markers = {m["generation"]: m for m in mf.read_compact_markers(lake_path, pid)}
        through = markers.get(base[0], {}).get("through_group", -1)
        paths.append(base[1])
    paths.extend(p for ep, p in mf.delta_runs(lake_path, pid) if ep > through)
    return paths


#: Bloom sidecar parameters: ~10 bits/key, 6 double-hashed probes ->
#: ~1% false-positive rate; the filter only SKIPS reads, never rows, so
#: a false positive costs one row-group read and a false negative is
#: impossible (standard per-SSTable bloom, cf. the LSM literature).
_BLOOM_K = 6
_BLOOM_H1 = "cdc-bloom-h1-key"
_BLOOM_H2 = "cdc-bloom-h2-key"


def _bloom_path(base_path: str) -> str:
    return base_path + ".bloom.npy"


def _bloom_positions(keys: np.ndarray, m: int) -> np.ndarray:
    """(len(keys), K) bit positions via double hashing of two
    independent deterministic 64-bit key hashes."""
    h1 = pd.util.hash_array(keys, hash_key=_BLOOM_H1)
    h2 = pd.util.hash_array(keys, hash_key=_BLOOM_H2) | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _write_bloom(base_path: str, conv_ids) -> None:
    """Key-membership bloom sidecar for a compacted base, written
    atomically next to it.  Built once per compaction from the unique
    conv_ids (vectorized hashing, no per-key Python)."""
    arr = np.unique(np.asarray(conv_ids.to_numpy(zero_copy_only=False), dtype=object))
    m = 1 << int(np.ceil(np.log2(max(10 * max(len(arr), 1), 64))))
    bits = np.zeros(m >> 3, np.uint8)
    if len(arr):
        pos = _bloom_positions(arr, m).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    tmp = _bloom_path(base_path) + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, bits, allow_pickle=False)
    os.replace(tmp, _bloom_path(base_path))


def _bloom_filter_keys(base_path: str, keys: list[str]) -> list[str] | None:
    """Subset of ``keys`` the base MIGHT contain, or None when no
    sidecar exists (older lakes: read everything)."""
    path = _bloom_path(base_path)
    try:
        bits = np.load(path, allow_pickle=False)
    except (OSError, ValueError):
        return None
    m = int(bits.shape[0]) << 3
    arr = np.asarray(keys, dtype=object)
    pos = _bloom_positions(arr, m)
    hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return [k for k, ok in zip(keys, hit.all(axis=1)) if ok]


def _read_run_pruned(
    path: str, keys: list[str], column: str = "conv_id"
) -> tuple[pa.Table | None, int, int]:
    """Row-group-pruned run read for point lookups: parquet footer
    min/max statistics on ``column`` select only the groups a requested
    key can live in (compacted bases are key-sorted and written with
    bounded row groups, so a k-key lookup touches O(k) groups of a
    multi-GB partition instead of scanning it).  Returns
    ``(rows, groups_read, groups_total)``; rows are already filtered to
    the requested keys.  Parquet string stats may be truncated, but
    truncation keeps them valid bounds, so pruning is always safe —
    a group with no stats is read (correctness over selectivity)."""
    import bisect

    keys_sorted = sorted(keys)
    f = pq.ParquetFile(path)
    md = f.metadata
    try:
        ci = f.schema_arrow.get_field_index(column)
    except KeyError:
        ci = -1
    pick: list[int] = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ci).statistics if ci >= 0 else None
        if st is None or not st.has_min_max:
            pick.append(g)
            continue
        lo, hi = st.min, st.max
        j = bisect.bisect_left(keys_sorted, lo)
        if j < len(keys_sorted) and keys_sorted[j] <= hi:
            pick.append(g)
    if not pick:
        return None, 0, md.num_row_groups
    t = f.read_row_groups(pick)
    t = t.filter(pc.is_in(t[column], value_set=pa.array(keys_sorted, pa.string())))
    return (t if t.num_rows else None), len(pick), md.num_row_groups


def _read_keys_pruned(
    lake_path: str, pid: int, keys: list[str]
) -> tuple[pa.Table | None, int, int]:
    """Merged LWW state restricted to ``keys``, reading only the row
    groups that can contain them.  Filtering each run by ``conv_id``
    before the merge preserves LWW exactly: every run's rows for a key
    either all pass or all fail the filter, and tombstones for the
    requested keys are retained until the merge drops them.

    Same reader-vs-compactor race guard as :func:`_partition_runs`: a
    concurrent ``compact()`` may unlink a just-listed base/delta; one
    re-list + re-read sees the post-compaction layout."""
    try:
        return _read_keys_pruned_once(lake_path, pid, keys)
    except FileNotFoundError:
        return _read_keys_pruned_once(lake_path, pid, keys)


def _read_keys_pruned_once(
    lake_path: str, pid: int, keys: list[str]
) -> tuple[pa.Table | None, int, int]:
    runs: list[pa.Table] = []
    read = total = 0
    for path in _partition_run_paths(lake_path, pid):
        run_keys = keys
        surviving = _bloom_filter_keys(path, keys)
        if surviving is not None:
            if not surviving:  # bloom proves no requested key is here
                continue
            run_keys = surviving
        t, r, n = _read_run_pruned(path, run_keys)
        read += r
        total += n
        if t is not None:
            runs.append(t)
    if not runs:
        return None, read, total
    merged = mg.merge_runs(runs, drop_tombstones=True)
    return (
        merged.drop_columns(
            [c for c in schemas.INTERNAL_COLUMNS if c in merged.schema.names]
        ),
        read,
        total,
    )


def _compact_partition(
    lake_path: str,
    pid: int,
    *,
    force: bool,
    drop_tombstones: bool = False,
    row_group_rows: int = BASE_ROW_GROUP_ROWS,
) -> bool:
    """Fold base + deltas into a new base generation.  Tombstones are
    RETAINED unless ``drop_tombstones`` (full compaction, WAL complete):
    dropping them mid-stream would let a later epoch's out-of-order
    event with an older ``(ts, lsn)`` resurrect a deleted key (the WAL's
    ooo jitter spans epoch boundaries — see sources/generator.py:130-131).
    Idempotent: generation id = prior generation + 1; marker commits it."""
    deltas = mf.delta_runs(lake_path, pid)
    if not deltas and not force:
        return False
    runs = _partition_runs(lake_path, pid)
    if not runs:
        return False
    if len(runs) == 1 and not deltas:
        return False
    merged = mg.merge_runs(runs, drop_tombstones=drop_tombstones)
    base = mf.current_base(lake_path, pid)
    gen = (base[0] + 1) if base else 1
    through = max((ep for ep, _ in deltas), default=-1)
    if base is not None:
        markers = {m["generation"]: m for m in mf.read_compact_markers(lake_path, pid)}
        through = max(through, markers.get(base[0], {}).get("through_group", -1))
    _atomic_write_parquet(
        mf.base_path(lake_path, pid, gen), merged, row_group_rows=row_group_rows
    )
    _write_bloom(mf.base_path(lake_path, pid, gen), merged["conv_id"])
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
        for victim in (base[1], _bloom_path(base[1])):
            try:
                os.remove(victim)
            except OSError:
                pass
    return True
