"""Small literal dimension tables + broadcast helpers.

Analog of the reference's inline dims built from ``union all`` literals
(``nyc_taxi_dbt/models/marts/core/dim_payment_types.sql:3-11``,
``dim_rate_codes.sql:3-11``, ``dim_vendors.sql:6-11``) and the 265-row
zone lookup (``snowflake/setup.sql:64-70``; dict cache at
``streaming/dashboard/utils/zone_lookup.py:6-21``).

Broadcast pattern: ``ray.put`` the Arrow table once on the driver, pass
the ObjectRef into a map_batches stage whose actor/task resolves it at
first use (ST5 analog) — no shuffle join for a <1k-row side.
"""

from __future__ import annotations

import pyarrow as pa

from nyc_taxi_data_pipeline_ray.sources.generator import TOOL_VOCAB

_TOOL_FAMILY = {
    "search": "retrieval", "browser": "retrieval", "maps": "retrieval",
    "python": "code", "bash": "code", "sql": "code",
    "calculator": "compute", "weather": "compute", "translate": "compute",
    "calendar": "productivity", "email": "productivity", "files": "productivity",
}
_SIDE_EFFECTING = {"email", "files", "calendar", "bash"}


def dim_roles() -> pa.Table:
    """4-row role dimension (the dim_vendors analog)."""
    roles = ["user", "assistant", "system", "tool"]
    return pa.table(
        {
            "role": roles,
            "is_model_generated": [r in ("assistant", "tool") for r in roles],
            "channel": ["human", "model", "config", "runtime"],
        }
    )


def dim_tools() -> pa.Table:
    """12-row tool dimension (the dim_payment_types analog)."""
    return pa.table(
        {
            "tool": TOOL_VOCAB,
            "tool_family": [_TOOL_FAMILY[t] for t in TOOL_VOCAB],
            "is_side_effecting": [t in _SIDE_EFFECTING for t in TOOL_VOCAB],
        }
    )


def date_spine(start: str = "2025-01-01", end: str = "2026-01-01") -> pa.Table:
    """Generated calendar dimension at full reference parity (the
    dim_date analog, ``nyc_taxi_dbt/models/marts/core/dim_date.sql:6-82``:
    date parts, names, period starts/ends, business-day + holiday flags,
    special events, and an era label — the reference's COVID-period
    column re-flavored as a transcript platform era).  Vectorized via
    pandas DatetimeIndex kernels, no recursive CTE; ``[start, end)``
    half-open, so the defaults cover all of 2025 INCLUDING Dec 31 (an
    end of 12-31 would silently drop New Year's Eve — facts on that day
    would join to null flags)."""
    import numpy as np
    import pandas as pd

    di = pd.date_range(start, end, inclusive="left")
    dow = ((di.dayofweek.to_numpy() + 1) % 7).astype(np.int32)  # Sunday=0 (DuckDB)
    month = di.month.to_numpy().astype(np.int32)
    dom = di.day.to_numpy().astype(np.int32)
    is_weekend = (dow == 0) | (dow == 6)
    thanksgiving = (month == 11) & (dow == 4) & (dom >= 22) & (dom <= 28)
    is_holiday = (
        ((month == 1) & (dom == 1))
        | ((month == 7) & (dom == 4))
        | ((month == 12) & (dom == 25))
        | thanksgiving
    )
    special_event = np.select(
        [
            (month == 12) & (dom == 31),
            (month == 3) & (dom == 17),
            thanksgiving,
            (month == 12) & (dom >= 20) & (dom <= 31),
        ],
        ["New Years Eve", "St Patricks Day", "Thanksgiving", "Holiday Season"],
        default=None,
    )
    era = np.select(
        [di < pd.Timestamp("2024-07-01"), di < pd.Timestamp("2025-01-01")],
        ["v1", "v2"],
        default="v3",
    )

    def ts(idx) -> pa.Array:
        return pa.array(idx.to_numpy().astype("datetime64[us]"), pa.timestamp("us"))

    def i32(arr) -> pa.Array:
        return pa.array(np.asarray(arr, np.int32), pa.int32())

    return pa.table(
        {
            "date_day": ts(di),
            "year": i32(di.year),
            "quarter": i32(di.quarter),
            "month": pa.array(month, pa.int32()),
            "week_of_year": i32(di.isocalendar().week.to_numpy()),
            "day_of_month": pa.array(dom, pa.int32()),
            "day_of_week": pa.array(dow, pa.int32()),
            "day_of_year": i32(di.dayofyear),
            "day_name": pa.array(di.day_name().to_numpy(), pa.string()),
            "month_name": pa.array(di.month_name().to_numpy(), pa.string()),
            "month_start": ts(di.to_period("M").to_timestamp()),
            "quarter_start": ts(di.to_period("Q").to_timestamp()),
            "year_start": ts(di.to_period("Y").to_timestamp()),
            "month_end": ts(di + pd.offsets.MonthEnd(0)),
            "fiscal_year": i32(di.year),
            "fiscal_quarter": i32(di.quarter),
            "is_weekday": pa.array(~is_weekend),
            "is_weekend": pa.array(is_weekend),
            "is_holiday": pa.array(is_holiday),
            "special_event": pa.array(special_event.astype(object), pa.string()),
            "platform_era": pa.array(era.astype(object), pa.string()),
        }
    )
