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


def date_spine(start: str = "2025-01-01", end: str = "2025-12-31") -> pa.Table:
    """Generated calendar dimension (the dim_date analog,
    ``nyc_taxi_dbt/models/marts/core/dim_date.sql:6-82``) — vectorized
    from np.arange, no recursive CTE."""
    import numpy as np

    days = np.arange(start, end, dtype="datetime64[D]")
    dow = ((days.astype("datetime64[D]").view("int64") + 4) % 7).astype(np.int32)  # 0=Sun
    months = days.astype("datetime64[M]")
    return pa.table(
        {
            "date_day": pa.array(days.astype("datetime64[us]"), pa.timestamp("us")),
            "year": pa.array(days.astype("datetime64[Y]").view("int64") + 1970, pa.int32()),
            "month": pa.array((months.view("int64") % 12) + 1, pa.int32()),
            "day_of_week": pa.array(dow, pa.int32()),
            "is_weekend": pa.array((dow == 0) | (dow == 6)),
        }
    )
