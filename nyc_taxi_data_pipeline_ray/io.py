"""Shared Dataset read helpers.

``read_parquet_clean`` strips the parquet files' pandas key-value schema
metadata right after the read (zero-copy, fused into the read stage):
pyarrow ``Schema.__hash__`` raises on metadata-bearing schemas, which
makes Ray Data's schema-deduplication log a warning in every downstream
reduce task and defeats its early-exit schema unification.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd


def fresh_tmp_root(prefix: str) -> str:
    """Per-process scratch root ``{prefix}_{pid}`` for a query's
    throwaway index, with stale-sibling cleanup: roots left behind by
    EXITED processes (best-of-N bench runs, ``--scaling``'s fresh
    processes, past pytest sessions) are removed; roots owned by live
    pids — a concurrent sweep — are left alone.  The per-pid suffix is
    what makes concurrent runs safe; this reclaims the disk they would
    otherwise leak across runs."""
    import glob
    import shutil

    if os.path.isdir("/proc"):
        for d in glob.glob(prefix + "_*"):
            pid = d.rsplit("_", 1)[-1]
            if (
                pid.isdigit()
                and int(pid) != os.getpid()
                and not os.path.exists(f"/proc/{pid}")
            ):
                shutil.rmtree(d, ignore_errors=True)
    root = f"{prefix}_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    return root


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(path: str, *, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    if (
        isinstance(path, str)
        and path.endswith(".parquet")
        and "schema" not in kwargs
        # a DIRECTORY named *.parquet (Spark-style output layout) would
        # crash pq.read_schema; the strip-stage fallback reads it fine
        and os.path.isfile(path)
    ):
        # pass the (column-pruned) file schema with the pandas key-value
        # metadata stripped (driver-side footer read): read tasks then
        # emit metadata-free blocks directly and no strip stage is needed
        import pyarrow.parquet as pq

        full = pq.read_schema(path)
        sel = pa.schema([full.field(c) for c in columns]) if columns else full
        kwargs["schema"] = sel.remove_metadata()
        return rd.read_parquet(path, columns=columns, **kwargs)
    ds = rd.read_parquet(path, columns=columns, **kwargs)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


def collect_table(ds: rd.Dataset) -> pa.Table:
    """Materialize a SMALL dataset (dims, pruned query sets) into one
    Arrow table on the caller, skipping the schemaless empty blocks a
    filtered/mapped read can emit."""
    import ray

    blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
    if not blocks:
        raise ValueError("collect_table: dataset produced no rows")
    return pa.concat_tables(blocks)
