"""Declarative check registry (dbt-test analogs: unique / not_null /
in_range / positive_value / accepted_values) over Datasets."""

import pyarrow as pa
import ray.data as rd

from nyc_taxi_data_pipeline_ray.stages import checks as ck


def _ds(rows):
    return rd.from_arrow(pa.table(rows))


def test_clean_data_passes():
    ds = _ds(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["user", "assistant", "user"],
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        }
    )
    rep = ck.run_checks(ds, ck.transcript_checks())
    assert rep["passed"] and rep["rows"] == 3


def test_violations_counted():
    ds = _ds(
        {
            "conv_id": ["a", "a", None, "b"],
            "turn_idx": pa.array([0, 0, 1, -2], pa.int32()),
            "role": ["user", "robot", "user", "assistant"],
            "ts": pa.array([1, 2, None, 4], pa.timestamp("us")),
        }
    )
    rep = ck.run_checks(ds, ck.transcript_checks())
    assert not rep["passed"]
    assert rep["not_null_conv_id"] == 1
    assert rep["not_null_ts"] == 1
    assert rep["in_range_turn_idx"] == 1
    assert rep["accepted_values_role"] == 1
    assert rep["unique_conv_id_turn_idx"] == 2  # both rows of the dup pair


def test_positive_and_range_builders():
    ds = _ds({"v": [1.0, -1.0, 0.0, 5.0]})
    rep = ck.run_checks(ds, [ck.positive_value("v"), ck.in_range("v", 0.0, 4.0)])
    assert rep["positive_v"] == 2
    assert rep["in_range_v"] == 2


def test_lake_snapshot_passes_checks(tmp_path):
    from nyc_taxi_data_pipeline_ray import CdcEngine, LakeConfig
    from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec

    gen = WalGenerator(
        WalSpec(seed=5, num_conversations=50, num_epochs=2, events_per_epoch=600,
                invalid_fraction=0.05)
    )
    wal = str(tmp_path / "wal")
    gen.write(wal)
    eng = CdcEngine(LakeConfig.open_or_create(str(tmp_path / "lake"), num_partitions=4))
    eng.apply(wal)
    rep = ck.run_checks(eng.snapshot(), ck.transcript_checks())
    assert rep["passed"], rep


def test_duplicate_check_names_raise():
    """Two checks sharing a generated name would silently clobber each
    other's counts (the quality gate could report passed=True while the
    clobbered check has violations) — run_checks refuses instead."""
    import pytest

    ds = _ds({"v": [1.0, 15.0]})
    with pytest.raises(ValueError, match="duplicate or reserved"):
        ck.run_checks(ds, [ck.in_range("v", 0.0, 4.0), ck.in_range("v", 10.0, 20.0)])
    with pytest.raises(ValueError, match="duplicate or reserved"):
        ck.run_checks(
            ds, [ck.Check(name="_rows", violations=lambda t: pa.array([False] * t.num_rows))]
        )


def test_stage_feature_edges():
    """n_words edge semantics (0 for empty/null text, boundary
    whitespace ignored), the empty-rules categorizer, and the
    date_spine defaults covering Dec 31."""
    import numpy as np

    from nyc_taxi_data_pipeline_ray.sources.dims import date_spine
    from nyc_taxi_data_pipeline_ray.stages.categorize import PatternCategorizer
    from nyc_taxi_data_pipeline_ray.stages.enrich import derive_turn_features

    t = pa.table(
        {
            "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
            "text": pa.array(["", "  a b  ", None, "x"], pa.string()),
            "tool": pa.array([None, "search", None, None], pa.string()),
        }
    )
    out = derive_turn_features(t)
    assert out["n_words"].to_pylist() == [0, 2, 0, 1]
    assert out["n_chars"].to_pylist() == [0, 7, 0, 1]

    lab = PatternCategorizer("text", [], default="misc")(t)
    assert lab["category"].to_pylist() == ["misc"] * 4

    spine = date_spine()  # defaults must include New Year's Eve
    df = spine.to_pandas()
    assert len(df) == 365
    nye = df[df["special_event"] == "New Years Eve"]
    assert len(nye) == 1 and str(nye["date_day"].iloc[0])[:10] == "2025-12-31"


def test_generator_rewrite_removes_stale_parts(tmp_path):
    """write() into an existing wal_dir must not layer: a previous run
    with smaller rows_per_file left more part files than the rewrite
    produces, and a glob reader would ingest the stale events."""
    import glob
    import os

    from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec

    wal = str(tmp_path / "wal")
    WalGenerator(
        WalSpec(seed=9, num_conversations=30, num_epochs=1, events_per_epoch=900,
                rows_per_file=300, dup_fraction=0.0)
    ).write(wal)
    assert len(glob.glob(os.path.join(wal, "epoch=000000", "*.parquet"))) == 3
    WalGenerator(
        WalSpec(seed=9, num_conversations=30, num_epochs=1, events_per_epoch=900,
                dup_fraction=0.0)
    ).write(wal)
    assert len(glob.glob(os.path.join(wal, "epoch=000000", "*.parquet"))) == 1
