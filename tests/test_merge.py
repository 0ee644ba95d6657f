"""LWW merge kernel unit tests (no Ray)."""

import pyarrow as pa

from nyc_taxi_data_pipeline_ray.state import merge as mg


def _t(rows):
    cols = {
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "lsn": pa.array([r[3] for r in rows], pa.int64()),
        "op": [r[4] for r in rows],
        "text": [r[5] for r in rows],
    }
    return pa.table(cols)


def test_lww_by_ts_then_lsn():
    t = _t(
        [
            ("a", 0, 100, 1, "insert", "v1"),
            ("a", 0, 300, 2, "update", "v2"),  # winner: later ts
            ("a", 0, 200, 9, "update", "v3"),  # bigger lsn but earlier ts loses
            ("b", 0, 100, 3, "insert", "b1"),
            ("b", 0, 100, 4, "update", "b2"),  # ts tie -> lsn breaks
        ]
    )
    out = mg.resolve_lww(mg.with_run_seq(t, 0), drop_tombstones=True)
    assert out.column("text").to_pylist() == ["v2", "b2"]


def test_tombstone_semantics():
    t = _t(
        [
            ("a", 0, 100, 1, "insert", "v1"),
            ("a", 0, 200, 2, "delete", None),
            ("b", 1, 100, 3, "insert", "b1"),
            ("b", 1, 50, 4, "delete", None),  # stale delete loses to insert
        ]
    )
    kept = mg.resolve_lww(mg.with_run_seq(t, 0), drop_tombstones=True)
    assert kept.column("conv_id").to_pylist() == ["b"]
    masked = mg.resolve_lww(mg.with_run_seq(t, 0), drop_tombstones=False)
    assert masked.num_rows == 2  # tombstone retained for later runs


def test_merge_runs_run_seq_tiebreak():
    old = _t([("a", 0, 100, 1, "insert", "old")])
    new = _t([("a", 0, 100, 1, "insert", "new")])  # identical stamp, newer run
    out = mg.merge_runs([old, new], drop_tombstones=True)
    assert out.column("text").to_pylist() == ["new"]


def test_merge_runs_base_beats_stale_delta():
    base = _t([("a", 0, 500, 9, "update", "fresh")])
    delta = _t([("a", 0, 100, 1, "update", "stale")])
    out = mg.merge_runs([base, delta], drop_tombstones=True)
    assert out.column("text").to_pylist() == ["fresh"]


def test_conform_widens_and_nullfills():
    t = pa.table({"a": pa.array([1, 2], pa.int32())})
    target = pa.schema([("a", pa.int64()), ("b", pa.string())])
    out = mg.conform(t, target)
    assert out.schema == target
    assert out["b"].null_count == 2


def test_empty_table():
    t = _t([])
    out = mg.resolve_lww(mg.with_run_seq(t, 0), drop_tombstones=True)
    assert out.num_rows == 0
