"""Derived-column projection + broadcast dim enrichment stages.

Analogs of the reference's intermediate/OBT layer:

- derived date parts / duration / buckets / flags
  (``nyc_taxi_dbt/models/intermediate/int_trips_validated.sql:46-85``,
  streaming enrichment ``streaming/spark/fraud_detector.py:206-214``)
  -> :func:`derive_turn_features`, one vectorized ``map_batches`` stage;
- the 5-way small-dim OBT join (``nyc_taxi_dbt/models/marts/core/
  obt_trips.sql:23-28``) -> :class:`BroadcastEnrich`, a map-side join
  against ``ray.put``-broadcast Arrow dims (no shuffle; ST5/J1 analog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from nyc_taxi_data_pipeline_ray.stages import replace_column


def derive_turn_features(batch: pa.Table) -> pa.Table:
    """Vectorized per-turn derived columns (P7/P8/P10/P11 analogs):

    - ``ts_date`` (day), ``ts_hour`` (hour of day)
    - ``day_bucket``: 5-way case over hour (the Morning Rush/... analog,
      ``int_trips_validated.sql:61-69``)
    - ``is_weekend``
    - ``n_chars`` / ``n_words`` of ``text``
    - ``is_tool_call`` flag
    """
    ts = batch["ts"]
    hour = pc.hour(ts)
    dow = pc.day_of_week(ts)  # 0=Mon
    text = pc.fill_null(batch["text"], "")
    n_chars = pc.utf8_length(text)
    # count non-space runs: ascii_split_whitespace emits boundary empty
    # tokens (1 for "", 3 for "a b "), which inflated word counts for
    # empty/whitespace-edged text — the regex count is 0 for "" and
    # matches str.split() semantics exactly
    n_words = pc.count_substring_regex(text, r"\S+")

    h = hour.combine_chunks().to_numpy(zero_copy_only=False)
    bucket = np.select(
        [h < 6, h < 10, h < 16, h < 20],
        ["night", "morning", "midday", "evening"],
        default="late",
    )

    out = batch
    for name, col in [
        ("ts_date", pc.floor_temporal(ts, unit="day")),
        ("ts_hour", pc.cast(hour, pa.int32())),
        ("day_bucket", pa.array(bucket)),
        ("is_weekend", pc.greater_equal(dow, 5)),
        ("n_chars", pc.cast(n_chars, pa.int64())),
        ("n_words", pc.cast(n_words, pa.int64())),
        ("is_tool_call", batch["tool"].is_valid()),
    ]:
        out = replace_column(out, name, col)
    return out


class BroadcastEnrich:
    """Actor-pool map-side join against broadcast dims (OBT analog).

    ``dims`` maps join-key column -> ObjectRef of a pyarrow Table whose
    first column is the key.  Resolved once per actor in ``__init__``
    (the zone-lookup-cache analog, ``dashboard/utils/zone_lookup.py:8-15``).
    """

    def __init__(self, dims: dict[str, "ray.ObjectRef"]):
        self.dims = {k: ray.get(ref) for k, ref in dims.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        for key, dim in self.dims.items():
            dim_key = dim.column_names[0]
            idx = pc.index_in(batch[key], value_set=dim[dim_key])
            for name in dim.column_names[1:]:
                batch = replace_column(batch, name, pc.take(dim[name], idx))
        return batch


def enrich_with_dims(ds, dims_tables: dict[str, pa.Table], *, concurrency: int = 2, batch_size: int = 65536):
    """Attach dim attributes with a broadcast join. ``dims_tables`` maps
    fact join-key -> small Arrow dim (key must be the dim's first column)."""
    refs = {k: ray.put(t) for k, t in dims_tables.items()}
    return ds.map_batches(
        BroadcastEnrich,
        fn_constructor_args=(refs,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
