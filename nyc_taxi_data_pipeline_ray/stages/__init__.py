"""Reusable Ray-Data stage callables (map_batches classes/functions)."""

from __future__ import annotations

import pyarrow as pa


def replace_column(t: pa.Table, name: str, col) -> pa.Table:
    """Append ``col`` as ``name``, replacing an existing column of that
    name — the overwrite idiom every stage output uses (re-running a
    stage must not fail on its own prior output)."""
    if name in t.schema.names:
        t = t.drop_columns([name])
    return t.append_column(name, col)
