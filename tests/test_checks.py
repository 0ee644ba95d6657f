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
