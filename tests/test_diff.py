"""CdcEngine.diff: before/after-image change classification between two
committed snapshots, checked against a dict-oracle diff (independent
LWW replay of each prefix, outer-joined in pandas)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nyc_taxi_data_pipeline_ray import CdcEngine, LakeConfig
from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec
from nyc_taxi_data_pipeline_ray.state import oracle

SPEC = WalSpec(
    seed=13,
    num_conversations=120,
    num_epochs=3,
    events_per_epoch=1200,
    p_update=0.3,
    p_delete=0.08,
    ooo_fraction=0.1,
    dup_fraction=0.02,
)


def _expected_diff(events: pa.Table, through_epoch: int) -> pd.DataFrame:
    a = oracle.replay(
        events.filter(pc.less_equal(events["epoch"], pa.scalar(through_epoch, pa.int32())))
    ).to_pandas()
    b = oracle.replay(events).to_pandas()
    m = a.merge(
        b, on=["conv_id", "turn_idx"], how="outer", suffixes=("_a", "_b"), indicator=True
    )
    ins = m["_merge"] == "right_only"
    dele = m["_merge"] == "left_only"
    upd = (m["_merge"] == "both") & ((m["ts_a"] != m["ts_b"]) | (m["lsn_a"] != m["lsn_b"]))
    exp = m[ins | dele | upd].copy()
    exp["change"] = np.where(
        exp["_merge"] == "right_only",
        "insert",
        np.where(exp["_merge"] == "left_only", "delete", "update"),
    )
    return exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _collect(ds) -> pd.DataFrame:
    from nyc_taxi_data_pipeline_ray.engine import _empty_diff

    batches = [
        b if isinstance(b, pa.Table) else pa.table(b)
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(batches or [_empty_diff()])
    return t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_diff_matches_oracle(tmp_path):
    gen = WalGenerator(SPEC)
    wal = os.path.join(str(tmp_path), "wal")
    gen.write(wal)
    eng = CdcEngine(
        LakeConfig.open_or_create(os.path.join(str(tmp_path), "lake"), num_partitions=4)
    )
    eng.apply(wal, max_epochs=1)
    eng.apply(wal)

    got = _collect(eng.diff(from_epoch=0))
    exp = _expected_diff(gen.events_table(), through_epoch=0)
    assert len(got) == len(exp)
    assert set(got["change"]) == {"insert", "update", "delete"}  # all 3 exercised
    assert (got["change"].to_numpy() == exp["change"].to_numpy()).all()
    assert (got["conv_id"].to_numpy() == exp["conv_id"].to_numpy()).all()
    assert (got["turn_idx"].to_numpy() == exp["turn_idx"].to_numpy()).all()
    for side, src in (("before", "a"), ("after", "b")):
        pd.testing.assert_series_equal(
            got[f"{side}_text"].fillna("∅"),
            exp[f"text_{src}"].fillna("∅").rename(f"{side}_text"),
        )
        assert (
            got[f"{side}_lsn"].fillna(-1).to_numpy()
            == exp[f"lsn_{src}"].fillna(-1).to_numpy()
        ).all()

    # self-diff is empty; diff against the same endpoint twice is stable
    assert _collect(eng.diff(from_epoch=0, to_epoch=0)).empty


def test_diff_below_compaction_watermark_raises(tmp_path):
    gen = WalGenerator(SPEC)
    wal = os.path.join(str(tmp_path), "wal")
    gen.write(wal)
    eng = CdcEngine(
        LakeConfig.open_or_create(os.path.join(str(tmp_path), "lake"), num_partitions=4)
    )
    eng.apply(wal, max_epochs=1)
    eng.apply(wal)
    eng.compact()
    with pytest.raises(Exception, match="compact"):
        _collect(eng.diff(from_epoch=0))
