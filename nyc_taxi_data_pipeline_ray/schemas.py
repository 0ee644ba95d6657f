"""Arrow schemas for the transcript lake and its change-event envelope.

The payload table is multi-turn transcripts per the project input hint:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])``, primary key ``(conv_id, turn_idx)``.

This is the analog of the reference's trip record: the Snowflake
``RAW.TRIPS`` evolvable table (``snowflake/setup.sql:58-61``) on the
batch side and the 21-field Kafka ``TripEvent`` JSON document
(``streaming/api/schemas.py:7-34``) on the streaming side.  The change
envelope adds ``(op, lsn, epoch)`` — op mirrors CDC semantics the
reference only has implicitly (its merge on a non-unique ``trip_id`` is
a last-writer-wins upsert, ``fct_trips.sql:1-7``), ``lsn`` is the
commit-order tiebreaker, ``epoch`` is the micro-batch id (the 5-second
trigger analog, ``streaming/spark/fraud_detector.py:309``).
"""

from __future__ import annotations

import pyarrow as pa

ROLES = ("user", "assistant", "system", "tool")

OPS = ("insert", "update", "delete")

#: Base (v1) transcript row — the lake's public schema.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

#: Change-event envelope (v1) = WAL segment row schema.
EVENT_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("epoch", pa.int32()),
    ]
    + list(TRANSCRIPT_SCHEMA)
)

#: Key columns of the lake (merge key of the upsert); consumed by
#: ``state.merge`` for the LWW sort/winner selection.
KEY_COLUMNS = ("conv_id", "turn_idx")

#: Last-writer-wins ordering columns (later wins; ``lsn`` breaks ``ts``
#: ties); consumed by ``state.merge``.
LWW_COLUMNS = ("ts", "lsn")

#: Envelope columns dropped from the public snapshot (``lsn`` is NOT
#: internal: snapshots retain it as the winner's provenance and the
#: equality oracle compares it); consumed by the engine's merged-state
#: readers.
INTERNAL_COLUMNS = ("op", "epoch")

#: Merged lake state as readers see it: the transcript payload plus the
#: winning ``lsn`` — EVENT_SCHEMA minus INTERNAL_COLUMNS, same column
#: order as the engine's merged output.  Empty reads must use THIS (not
#: TRANSCRIPT_SCHEMA, which lacks ``lsn``) or an empty partition's
#: schema diverges from a populated one.
STATE_SCHEMA = pa.schema(
    [f for f in EVENT_SCHEMA if f.name not in INTERNAL_COLUMNS]
)


def empty_state() -> pa.Table:
    """A 0-row merged-state table (see :data:`STATE_SCHEMA`)."""
    return pa.table({f.name: pa.array([], f.type) for f in STATE_SCHEMA})


def unify(*schemas: pa.Schema) -> pa.Schema:
    """Widening unification (add-column + int32->int64 etc.).

    Mirrors Snowflake ``ENABLE_SCHEMA_EVOLUTION`` + case-insensitive
    ``MATCH_BY_COLUMN_NAME`` (``snowflake/setup.sql:58-61``,
    ``airflow/dags/nyc_taxi_sync_dag.py:46``) via
    ``pa.unify_schemas(promote_options="permissive")``.
    """
    return pa.unify_schemas(list(schemas), promote_options="permissive")
