"""Single-process reference reducer (the golden-output oracle).

The reference repo has no golden tests (``docs/ERRORS_AND_FIXES.md``
documents run-and-see debugging); this module supplies the end-state
equality oracle the north rule demands: a dict-based LWW apply over the
full event log, against which the distributed engine's final lake state
must match exactly (per-turn ``text`` equality under stable
``(conv_id, turn_idx)`` ordering).
"""

from __future__ import annotations

import pyarrow as pa

from nyc_taxi_data_pipeline_ray import schemas
from nyc_taxi_data_pipeline_ray.state import merge as merge_mod


def is_valid_event(row: dict) -> bool:
    """Mirror of stages.validate.validate_batch — keep in sync."""
    if row.get("conv_id") in (None, ""):
        return False
    ti = row.get("turn_idx")
    if ti is None or ti < 0:
        return False
    if row.get("ts") is None or row.get("lsn") is None:
        return False
    if row.get("op") not in schemas.OPS:
        return False
    if row["op"] != "delete" and row.get("role") not in schemas.ROLES:
        return False
    return True


def replay(events: pa.Table) -> pa.Table:
    """Apply the change log with explicit LWW(ts, lsn); return the final
    transcript table sorted by (conv_id, turn_idx).  On an exact
    (ts, lsn) tie the LATER arrival wins — the same rule as the
    engine's stable sort + last-per-key winner selection (ties only
    arise from duplicate delivery or cross-lake re-application, but the
    oracle must not diverge even then)."""
    payload_cols = [
        n for n in events.schema.names if n not in schemas.INTERNAL_COLUMNS
    ]
    state: dict[tuple, dict] = {}
    for row in events.to_pylist():
        if not is_valid_event(row):
            continue
        key = (row["conv_id"], row["turn_idx"])
        stamp = (row["ts"], row["lsn"])
        cur = state.get(key)
        if cur is not None and (cur["ts"], cur["lsn"]) > stamp:
            continue
        state[key] = {c: row.get(c) for c in payload_cols} | {"op": row["op"]}
    rows = [
        {k: v for k, v in r.items() if k != "op"}
        for r in state.values()
        if r["op"] != "delete"
    ]
    schema = pa.schema([events.schema.field(c) for c in payload_cols])
    if not rows:
        # typed empty: pa.table({c: []}) would infer NULL-typed columns
        # and an all-deleted lake would spuriously mismatch the engine's
        # TRANSCRIPT_SCHEMA-typed empty snapshot
        return pa.table({f.name: pa.array([], f.type) for f in schema})
    cols = {c: [r.get(c) for r in rows] for c in payload_cols}
    t = pa.table(cols, schema=schema)
    return merge_mod.sort_by_key(t)
