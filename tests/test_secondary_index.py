"""SecondaryIndex: incrementally-maintained value index over a non-key
lake column (``tool``).  Pins (a) lookup == snapshot filter under a
random op mix, (b) partition-reuse incrementality, (c) row-group
pruning on the value column, (d) updates moving a key between values."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nyc_taxi_data_pipeline_ray import CdcEngine, LakeConfig
from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec
from nyc_taxi_data_pipeline_ray.state.secondary_index import SecondaryIndex

SPEC = WalSpec(
    seed=31,
    num_conversations=150,
    num_epochs=3,
    events_per_epoch=1500,
    p_update=0.3,
    p_delete=0.08,
    ooo_fraction=0.1,
)


def _build(tmp, **cfg):
    gen = WalGenerator(SPEC)
    wal = os.path.join(tmp, "wal")
    gen.write(wal)
    eng = CdcEngine(
        LakeConfig.open_or_create(
            os.path.join(tmp, "lake"), num_partitions=4, **cfg
        )
    )
    idx = SecondaryIndex(eng, os.path.join(tmp, "toolidx"), "tool")
    return gen, wal, eng, idx


def _collect(ds) -> pa.Table:
    batches = [
        b if isinstance(b, pa.Table) else pa.table(b)
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables([b for b in batches if b.num_rows] or batches[:1])
    return t.sort_by(
        [("value", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
    ).combine_chunks()


def _expected(eng, values) -> pa.Table:
    snap = eng.snapshot_table()
    hit = snap.filter(pc.is_in(snap["tool"], value_set=pa.array(sorted(values))))
    t = pa.table(
        {
            "value": hit["tool"],
            "conv_id": hit["conv_id"],
            "turn_idx": hit["turn_idx"],
        }
    )
    return t.sort_by(
        [("value", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
    ).combine_chunks()


def test_index_lookup_equals_snapshot_filter(tmp_path):
    gen, wal, eng, idx = _build(str(tmp_path))
    eng.apply(wal)
    idx.refresh()
    snap = eng.snapshot_table()
    tools = sorted({t for t in snap["tool"].to_pylist() if t})
    assert len(tools) >= 2
    probe = tools[:2]
    got = _collect(idx.lookup(probe))
    assert got.equals(_expected(eng, probe))
    # unknown value -> empty
    assert idx.lookup(["no-such-tool"]).count() == 0


def test_index_incremental_reuse_and_noop(tmp_path):
    gen, wal, eng, idx = _build(str(tmp_path))
    eng.apply(wal, max_epochs=1)
    r1 = idx.refresh()
    assert r1["refreshed"] == 4
    eng.apply(wal)
    idx.refresh()
    r3 = idx.refresh()
    assert r3["refreshed"] == 0 and r3["reused"] == 4
    snap = eng.snapshot_table()
    tools = sorted({t for t in snap["tool"].to_pylist() if t})
    got = _collect(idx.lookup(tools))
    assert got.equals(_expected(eng, tools))


def test_index_row_group_pruning(tmp_path):
    gen, wal, eng, idx = _build(str(tmp_path), base_row_group_rows=32)
    eng.apply(wal)
    idx.refresh()
    snap = eng.snapshot_table()
    tools = sorted({t for t in snap["tool"].to_pylist() if t})
    st = idx.lookup_stats([tools[0]])
    assert st["groups_total"] >= 4, st
    assert 0 < st["groups_read"] < st["groups_total"], st
    assert st["hits"] == _expected(eng, [tools[0]]).num_rows


def test_index_on_evolved_column(tmp_path):
    """An index over a column that only EXISTS after mid-stream schema
    evolution (`model`, added at epoch 1): before evolution the index
    is empty-but-valid; after, it serves the evolved values — and
    rows written before the evolution (null model) never appear."""
    spec = WalSpec(
        seed=13,
        num_conversations=80,
        num_epochs=2,
        events_per_epoch=800,
        evolve_at_epoch=1,
    )
    gen = WalGenerator(spec)
    wal = os.path.join(str(tmp_path), "wal")
    gen.write(wal)
    eng = CdcEngine(
        LakeConfig.open_or_create(os.path.join(str(tmp_path), "lake"), num_partitions=4)
    )
    idx = SecondaryIndex(eng, os.path.join(str(tmp_path), "modelidx"), "model")
    eng.apply(wal, max_epochs=1)
    r = idx.refresh()
    assert r["rows"] == 0  # column doesn't exist yet: empty, not broken
    eng.apply(wal)
    idx.refresh()
    snap = eng.snapshot_table()
    assert "model" in snap.schema.names
    vals = sorted({v for v in snap["model"].to_pylist() if v})
    assert vals, "evolution should have written model values"
    got = _collect(idx.lookup(vals))
    hit = snap.filter(pc.is_in(snap["model"], value_set=pa.array(vals)))
    exp = pa.table(
        {"value": hit["model"], "conv_id": hit["conv_id"], "turn_idx": hit["turn_idx"]}
    ).sort_by(
        [("value", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
    ).combine_chunks()
    got = got.set_column(2, "turn_idx", pc.cast(got["turn_idx"], exp["turn_idx"].type))
    assert got.equals(exp)


def test_index_tracks_value_moves(tmp_path):
    """An update that changes a turn's tool re-homes the key to the new
    value's posting list and removes it from the old one."""
    gen, wal, eng, idx = _build(str(tmp_path))
    eng.apply(wal)
    idx.refresh()
    snap = eng.snapshot_table()
    with_tool = snap.filter(pc.is_valid(snap["tool"]))
    conv = with_tool["conv_id"][0].as_py()
    ti = with_tool["turn_idx"][0].as_py()
    old_tool = with_tool["tool"][0].as_py()
    max_lsn = pc.max(snap["lsn"]).as_py()
    max_ts = pc.max(snap["ts"]).as_py()
    ep = pa.table(
        {
            "lsn": pa.array([max_lsn + 1], pa.int64()),
            "op": pa.array(["update"]),
            "epoch": pa.array([SPEC.num_epochs], pa.int32()),
            "conv_id": pa.array([conv]),
            "turn_idx": pa.array([ti], pa.int32()),
            "role": pa.array(["tool"]),
            "text": pa.array(["moved"]),
            "tool": pa.array(["brand-new-tool"], pa.string()),
            "ts": pa.array([max_ts], pa.timestamp("us")),
        }
    )
    d = os.path.join(str(tmp_path), "wal", f"epoch={SPEC.num_epochs:06d}")
    os.makedirs(d)
    pq.write_table(ep, os.path.join(d, "part-0000.parquet"))
    eng.apply(wal)
    r = idx.refresh()
    assert 1 <= r["refreshed"] <= 4
    new_hits = _collect(idx.lookup(["brand-new-tool"]))
    assert new_hits.num_rows == 1
    assert new_hits["conv_id"][0].as_py() == conv
    old_hits = _collect(idx.lookup([old_tool]))
    keys = set(
        zip(old_hits["conv_id"].to_pylist(), old_hits["turn_idx"].to_pylist())
    )
    assert (conv, ti) not in keys


def test_nonstring_probe_values_match_stored_rendering(tmp_path):
    """The index stores values via Arrow's string cast; probes must be
    rendered the SAME way.  ``str(datetime)`` omits the ``.000000``
    Arrow prints for whole-second timestamps, so a datetime probe used
    to return zero hits silently."""
    from datetime import datetime

    import pandas as pd

    from nyc_taxi_data_pipeline_ray import schemas
    from nyc_taxi_data_pipeline_ray.state.secondary_index import (
        _canon_probe_values,
    )

    assert _canon_probe_values([datetime(2031, 1, 1)]) == [
        "2031-01-01 00:00:00.000000"
    ]
    assert str(datetime(2031, 1, 1)) == "2031-01-01 00:00:00"  # why str() lost
    assert _canon_probe_values([True, None]) == ["true"]
    assert _canon_probe_values(["a", "a"]) == ["a"]

    gen, wal, eng, _ = _build(str(tmp_path))
    eng.apply(wal)
    # a turn at a whole-second timestamp (microsecond == 0)
    ev = pa.table(
        {
            "lsn": pa.array([30_000_000], pa.int64()),
            "op": pa.array(["insert"]),
            "epoch": pa.array([SPEC.num_epochs], pa.int32()),
            "conv_id": pa.array(["conv-ts-probe"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["system"]),
            "text": pa.array(["whole-second ts"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([pd.Timestamp("2031-01-01").to_datetime64()]),
        }
    ).cast(schemas.EVENT_SCHEMA)
    d = os.path.join(str(tmp_path), "wal", f"epoch={SPEC.num_epochs:06d}")
    os.makedirs(d)
    pq.write_table(ev, os.path.join(d, "part-0000.parquet"))
    eng.apply(os.path.join(str(tmp_path), "wal"))

    idx = SecondaryIndex(eng, os.path.join(str(tmp_path), "tsidx"), "ts")
    idx.refresh()
    got = _collect(idx.lookup([datetime(2031, 1, 1)]))
    assert got.num_rows == 1
    assert got["conv_id"][0].as_py() == "conv-ts-probe"
    stats = idx.lookup_stats([datetime(2031, 1, 1)])
    assert stats["hits"] == 1
