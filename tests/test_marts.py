"""Transcript marts vs DuckDB oracle on the same lake snapshot."""

import duckdb
import pandas as pd
import pytest

import ray.data as rd

from nyc_taxi_data_pipeline_ray import CdcEngine, LakeConfig
from nyc_taxi_data_pipeline_ray.pipelines import marts
from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("marts"))
    spec = WalSpec(seed=31, num_conversations=120, num_epochs=2, events_per_epoch=2000)
    gen = WalGenerator(spec)
    gen.write(f"{tmp}/wal")
    eng = CdcEngine(LakeConfig.open_or_create(f"{tmp}/lake", num_partitions=4))
    eng.apply(f"{tmp}/wal")
    snap = eng.snapshot_table()
    return eng, snap


def _duck(snap):
    con = duckdb.connect()
    con.register("turns", snap.to_pandas())
    return con


def test_conversation_rollup(lake):
    eng, snap = lake
    got = (
        marts.conversation_rollup(eng.snapshot())
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    exp = (
        _duck(snap)
        .execute(
            """
        select conv_id, count(*) n_turns,
               sum(length(coalesce(text,''))) total_chars,
               min(ts) first_ts, max(ts) last_ts
        from turns group by conv_id order by conv_id
        """
        )
        .fetchdf()
    )
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["n_turns"].astype("int64"), exp["n_turns"].astype("int64"), check_names=False
    )
    pd.testing.assert_series_equal(
        got["total_chars"].astype("int64"),
        exp["total_chars"].astype("int64"),
        check_names=False,
    )
    assert (got["first_ts"] == exp["first_ts"]).all()
    assert (got["last_ts"] == exp["last_ts"]).all()


def test_daily_rollup_distinct(lake):
    eng, snap = lake
    got = marts.daily_rollup(eng.snapshot())
    exp = (
        _duck(snap)
        .execute(
            """
        select date_trunc('day', ts) ts_date, count(distinct conv_id) n_conversations,
               count(*) n_turns
        from turns group by 1 order by 1
        """
        )
        .fetchdf()
    )
    assert list(got["n_conversations"]) == list(exp["n_conversations"])
    assert list(got["n_turns"]) == list(exp["n_turns"])


def test_daily_lag(lake):
    eng, _ = lake
    df = marts.daily_with_lag(eng.snapshot())
    assert pd.isna(df["prev_turns"].iloc[0])
    if len(df) > 1:
        assert df["prev_turns"].iloc[1] == df["n_turns"].iloc[0]


def test_top_conversations(lake):
    eng, snap = lake
    got = marts.top_conversations(eng.snapshot(), min_turns=2, k=10)
    exp = (
        _duck(snap)
        .execute(
            """
        select conv_id, count(*) n_turns, sum(length(coalesce(text,''))) total_chars
        from turns group by conv_id having count(*) >= 2
        order by total_chars desc, conv_id limit 10
        """
        )
        .fetchdf()
    )
    assert list(got["conv_id"]) == list(exp["conv_id"])
    assert len(got) <= 10


def test_role_activity_percent_rank(lake):
    eng, _ = lake
    df = marts.role_activity(eng.snapshot())
    assert set(df.columns) >= {"role", "n_turns", "activity_percent_rank"}
    assert df["activity_percent_rank"].iloc[-1] == 1.0
    assert df["activity_percent_rank"].iloc[0] == 0.0


def test_obt_broadcast_join(lake):
    eng, snap = lake
    obt = marts.obt_turns(eng.snapshot()).to_pandas()
    assert {"is_model_generated", "channel", "tool_family", "is_side_effecting"} <= set(
        obt.columns
    )
    asst = obt[obt["role"] == "assistant"]
    assert asst["is_model_generated"].all()
    # null tool -> null dim attributes (left-join semantics)
    no_tool = obt[obt["tool"].isna()]
    assert no_tool["tool_family"].isna().all()


def test_scoring_and_flag_frequency(lake):
    eng, _ = lake
    scored = marts.scored_turns(eng.snapshot())
    df = scored.to_pandas()
    assert (df["anomaly_score"] >= 0).all() and (df["anomaly_score"] <= 100).all()
    freq = marts.flag_frequency(eng.snapshot())
    if len(freq):
        assert (freq["count"] > 0).all()
        # counts reconcile with flat flag occurrences
        total_flags = df["anomaly_flags"].map(len).sum()
        assert freq["count"].sum() == total_flags
