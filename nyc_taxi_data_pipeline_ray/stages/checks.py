"""Declarative data-quality check registry (the dbt-test analog).

The reference ships schema tests — ``unique`` / ``not_null`` on model
keys (``nyc_taxi_dbt/models/staging/schema.yml:7-10,61-69``) and custom
generic macros ``in_range`` / ``positive_value``
(``nyc_taxi_dbt/macros/tests/test_in_range.sql:1-17``,
``test_positive_value.sql:2-11``) — run by ``dbt test`` after each
build.  Here each check is a vectorized predicate over a
``ray.data.Dataset`` that returns its violating rows; ``run_checks``
executes a check list and reports pass/fail + violation counts, fully
distributed (one ``map_batches`` pass per check, tiny partial counters,
no driver-side row loops).

Checks compose into the apply loop the way dbt tests gate a dbt run:
``CdcEngine.apply`` -> ``run_checks(engine.snapshot(), TRANSCRIPT_CHECKS)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


@dataclass(frozen=True)
class Check:
    name: str
    #: batch -> boolean mask of VIOLATING rows (vectorized)
    violations: Callable[[pa.Table], "pa.ChunkedArray | pa.Array"]
    description: str = ""


def not_null(column: str) -> Check:
    return Check(
        name=f"not_null_{column}",
        violations=lambda t: pc.is_null(t[column]),
        description=f"{column} must not be null",
    )


def in_range(column: str, lo, hi) -> Check:
    def v(t: pa.Table):
        c = t[column]
        ok = pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        return pc.invert(pc.fill_null(ok, False))

    return Check(
        name=f"in_range_{column}",
        violations=v,
        description=f"{column} in [{lo}, {hi}]",
    )


def positive_value(column: str) -> Check:
    def v(t: pa.Table):
        return pc.invert(pc.fill_null(pc.greater(t[column], 0), False))

    return Check(
        name=f"positive_{column}",
        violations=v,
        description=f"{column} > 0",
    )


def accepted_values(column: str, values: list) -> Check:
    def v(t: pa.Table):
        return pc.invert(
            pc.fill_null(pc.is_in(t[column], value_set=pa.array(values)), False)
        )

    return Check(
        name=f"accepted_values_{column}",
        violations=v,
        description=f"{column} in {values}",
    )


def unique_key(columns: list[str]) -> Check:
    """Composite-key uniqueness.  Needs key-grouped input (one partition's
    rows in one batch, as lake snapshots provide); duplicate keys within a
    batch are flagged.  For arbitrary datasets run it after a
    ``groupby(columns)`` co-location."""

    def v(t: pa.Table):
        import numpy as np

        if t.num_rows == 0:
            return pa.array([], pa.bool_())
        idx = pc.sort_indices(
            t.select(columns), sort_keys=[(c, "ascending") for c in columns]
        )
        keys = t.select(columns).take(idx)
        dup_sorted = np.zeros(t.num_rows, bool)
        cols = [keys[c] for c in columns]
        eq = None
        for c in cols:
            e = pc.equal(c.slice(0, t.num_rows - 1), c.slice(1)).to_numpy(
                zero_copy_only=False
            )
            e = np.nan_to_num(e).astype(bool)
            eq = e if eq is None else (eq & e)
        dup_sorted[1:] = eq
        # also flag the first of each duplicate run
        dup_sorted[:-1] |= eq
        out = np.zeros(t.num_rows, bool)
        out[idx.to_numpy()] = dup_sorted
        return pa.array(out)

    return Check(
        name="unique_" + "_".join(columns),
        violations=v,
        description=f"({', '.join(columns)}) unique",
    )


#: the transcript-lake check suite (mirrors the reference's dbt tests on
#: fct_trips/staging keys, re-keyed to (conv_id, turn_idx))
def transcript_checks() -> list[Check]:
    from nyc_taxi_data_pipeline_ray import schemas

    return [
        not_null("conv_id"),
        not_null("turn_idx"),
        not_null("ts"),
        in_range("turn_idx", 0, 1 << 31),
        accepted_values("role", list(schemas.ROLES)),
        unique_key(["conv_id", "turn_idx"]),
    ]


def run_checks(ds: rd.Dataset, checks: list[Check]) -> dict:
    """Run every check in ONE distributed pass; returns
    ``{check_name: violation_count}`` plus ``rows`` and ``passed``.

    Check names must be unique (generated names encode only the column,
    so e.g. two ``in_range('v', ...)`` checks collide): the per-batch
    counts are keyed by name, and a silent overwrite would let the
    quality gate report ``passed`` while the clobbered check has
    violations — so duplicates (and the reserved ``_rows``/``rows``/
    ``passed`` keys) raise instead."""
    names = [c.name for c in checks]
    reserved = {"_rows", "rows", "passed"}
    dupes = {n for n in names if names.count(n) > 1} | (set(names) & reserved)
    if dupes:
        raise ValueError(
            f"duplicate or reserved check names {sorted(dupes)}: give each "
            "check a distinct name (Check(name=...)) so no count is "
            "silently overwritten"
        )

    def count_violations(t: pa.Table) -> pa.Table:
        row = {"_rows": [t.num_rows]}
        for c in checks:
            mask = c.violations(t)
            n = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            row[c.name] = [int(n)]
        return pa.table(row)

    parts = ds.map_batches(
        count_violations, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    out = {"rows": int(parts["_rows"].sum())}
    for n in names:
        out[n] = int(parts[n].sum())
    out["passed"] = all(out[n] == 0 for n in names)
    return out
