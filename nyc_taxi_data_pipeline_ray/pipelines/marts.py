"""Derived marts over the compacted transcript lake (the dbt gold layer).

Each function is a short Dataset pipeline over ``engine.snapshot()`` (or
any transcript Dataset), mirroring the reference's marts/aggregations/
insights:

- :func:`conversation_rollup`  <- agg_monthly
  (``nyc_taxi_dbt/models/marts/aggregations/agg_monthly.sql:3-46``):
  grouped sums/means/conditional shares, here per conversation.
- :func:`daily_rollup`         <- same, per day, with count-distinct.
- :func:`daily_with_lag`       <- agg_yearly YoY lag
  (``agg_yearly.sql:3-25``) — window-lag on the tiny aggregate, shifted
  driver-side exactly like the reference's ``lag() over (order by ...)``.
- :func:`top_conversations`    <- top-k routes
  (``insight_route_pricing.sql:3-19``): group -> having -> sort -> limit.
- :func:`role_activity`        <- zone heatmap percent_rank
  (``insight_zone_heatmap.sql:3-42``).
- :func:`obt_turns`            <- obt_trips 5-way broadcast dim join
  (``obt_trips.sql:23-28``).
- :func:`scored_turns` + :func:`flag_frequency` <- streaming fraud aggs
  (``streaming/spark/fraud_detector.py:129-179``; flag flatten
  ``dashboard/pages/2_🔍_Fraud_Monitor.py:116-125``).

All aggregations pre-aggregate inside ``map_batches`` implicitly via
Ray Data's hash aggregate; grouped results here are small (one row per
conversation/day), so driver-side materialization of the *aggregate*
is safe — the input Dataset streams.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from nyc_taxi_data_pipeline_ray.sources import dims as dims_mod
from nyc_taxi_data_pipeline_ray.stages import enrich, replace_column, score


def _with_features(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(enrich.derive_turn_features, batch_format="pyarrow")


def conversation_rollup(ds: rd.Dataset) -> rd.Dataset:
    """Per-conversation aggregate: turns, chars, words, tool share,
    first/last ts.  Conditional aggregates (assistant-only chars) follow
    the reference's FILTER-aggregate pattern (``agg_monthly.sql:16-23``)
    as pre-masked columns + Sum."""

    def pre(batch: pa.Table) -> pa.Table:
        batch = enrich.derive_turn_features(batch)
        is_asst = pc.equal(pc.fill_null(batch["role"], ""), "assistant")
        asst_chars = pc.if_else(is_asst, batch["n_chars"], pa.scalar(0, pa.int64()))
        batch = replace_column(batch, "asst_chars", asst_chars)
        return replace_column(
            batch, "is_tool_i", pc.cast(batch["is_tool_call"], pa.int64())
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Count(alias_name="n_turns"),
            Sum("n_chars", alias_name="total_chars"),
            Sum("n_words", alias_name="total_words"),
            Sum("asst_chars", alias_name="assistant_chars"),
            Sum("is_tool_i", alias_name="n_tool_calls"),
            Min("ts", alias_name="first_ts"),
            Max("ts", alias_name="last_ts"),
            Mean("n_chars", alias_name="avg_chars"),
        )
    )


def daily_rollup(ds: rd.Dataset) -> pd.DataFrame:
    """Per-day aggregate incl. count-distinct conversations (the
    ``count(distinct pickup_date)`` analog, ``agg_monthly.sql:9``) —
    distinct via a two-level groupby cascade (partial/final pattern,
    ``agg_yearly.sql:14``)."""
    # project to exactly the two columns the aggregate needs — running
    # the full feature stage (regex word count, day buckets) here would
    # burn CPU and widen every row entering the shuffle
    def day_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts_date": pc.floor_temporal(t["ts"], unit="day"),
                "conv_id": t["conv_id"],
            }
        )

    per_day_conv = (
        ds.map_batches(day_key, batch_format="pyarrow")
        .groupby(["ts_date", "conv_id"])
        .aggregate(Count(alias_name="turns"))
    )
    out = (
        per_day_conv.groupby("ts_date")
        .aggregate(Count(alias_name="n_conversations"), Sum("turns", alias_name="n_turns"))
        .sort("ts_date")
        .to_pandas()
    )
    return out


def daily_with_lag(ds: rd.Dataset) -> pd.DataFrame:
    """Day-over-day deltas: the lag()-window analog
    (``insight_payment_shift.sql:7-8``) — tiny sorted aggregate, shift
    on the driver."""
    df = daily_rollup(ds)
    df["prev_turns"] = df["n_turns"].shift(1)
    df["turns_dod_pct"] = (
        (df["n_turns"] - df["prev_turns"]) / df["prev_turns"] * 100
    ).round(2)
    return df


def top_conversations(ds: rd.Dataset, *, min_turns: int = 2, k: int = 100) -> pd.DataFrame:
    """group -> having -> rank -> limit (``insight_route_pricing.sql:3-19``)."""
    agg = conversation_rollup(ds)
    out = (
        agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_turns"], min_turns)),
            batch_format="pyarrow",
        )
        # conv_id tiebreak: a bare total_chars sort leaves tie order (and
        # the k-boundary membership) nondeterministic across runs
        .sort(["total_chars", "conv_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out


def role_activity(ds: rd.Dataset) -> pd.DataFrame:
    """Per-role activity + percent_rank (``insight_zone_heatmap.sql:3-42``);
    4 groups -> driver-side rank/n."""
    # same projection discipline as daily_rollup: only role + n_chars
    def role_chars(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "role": t["role"],
                "n_chars": pc.cast(
                    pc.utf8_length(pc.fill_null(t["text"], "")), pa.int64()
                ),
            }
        )

    df = (
        ds.map_batches(role_chars, batch_format="pyarrow")
        .groupby("role")
        .aggregate(Count(alias_name="n_turns"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
    )
    df = df.sort_values("n_turns", ignore_index=True)
    n = len(df)
    df["activity_percent_rank"] = (
        (df["n_turns"].rank(method="min") - 1) / max(n - 1, 1)
    ).round(4)
    return df


def obt_turns(ds: rd.Dataset) -> rd.Dataset:
    """One-big-table: broadcast join of role + tool dims onto turns."""
    return enrich.enrich_with_dims(
        _with_features(ds),
        {"role": dims_mod.dim_roles(), "tool": dims_mod.dim_tools()},
    )


def scored_turns(ds: rd.Dataset) -> rd.Dataset:
    """Anomaly-scored turns (P18/P19 analog)."""
    return ds.map_batches(score.score_batch, batch_format="pyarrow")


def flag_frequency(ds: rd.Dataset) -> pd.DataFrame:
    """Flatten ``anomaly_flags`` list column -> per-flag counts
    (``2_🔍_Fraud_Monitor.py:116-125`` analog) — pc.list_flatten +
    value_counts per batch, then a tiny groupby-sum."""

    def flatten(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch[score.FLAGS_COL])
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"flag": vc.field("values"), "n": vc.field("counts")})

    out = (
        scored_turns(ds)
        .map_batches(flatten, batch_format="pyarrow")
        .groupby("flag")
        .aggregate(Sum("n", alias_name="count"))
        .sort("count", descending=True)
        .to_pandas()
    )
    return out
