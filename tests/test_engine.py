"""CdcEngine end-to-end: equality vs oracle, exactly-once, resume,
schema evolution, skew — the dbt-test surface re-expressed as pytest
(reference ``nyc_taxi_dbt/models/staging/schema.yml``, ``tests/*.sql``)."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nyc_taxi_data_pipeline_ray import CdcEngine, LakeConfig
from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec
from nyc_taxi_data_pipeline_ray.state import oracle


def _build(tmp, spec, **lake_kwargs):
    gen = WalGenerator(spec)
    wal = os.path.join(tmp, "wal")
    gen.write(wal)
    eng = CdcEngine(LakeConfig.open_or_create(os.path.join(tmp, "lake"), num_partitions=4, **lake_kwargs))
    return gen, wal, eng


def _assert_equal_state(eng, gen):
    snap = eng.snapshot_table()
    exp = oracle.replay(gen.events_table())
    cols = sorted(exp.schema.names)
    a, b = snap.select(cols), exp.select(cols)
    assert a.num_rows == b.num_rows
    assert a.equals(b)
    return snap


SPEC = WalSpec(
    seed=7,
    num_conversations=150,
    num_epochs=3,
    events_per_epoch=1500,
    ooo_fraction=0.1,
    dup_fraction=0.05,
    invalid_fraction=0.02,
)


@pytest.fixture(scope="module")
def applied(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("eng"))
    gen, wal, eng = _build(tmp, SPEC)
    rep = eng.apply(wal)
    return gen, wal, eng, rep


def test_end_state_equality(applied):
    gen, _, eng, rep = applied
    assert rep.epochs == [0, 1, 2]
    _assert_equal_state(eng, gen)


def test_key_uniqueness_and_not_null(applied):
    # dbt `unique` + `not_null` analogs (schema.yml:61-69, :7-10)
    _, _, eng, _ = applied
    snap = eng.snapshot_table()
    keys = [(c, t) for c, t in zip(snap["conv_id"].to_pylist(), snap["turn_idx"].to_pylist())]
    assert len(keys) == len(set(keys))
    assert snap["conv_id"].null_count == 0
    assert snap["turn_idx"].null_count == 0
    assert snap["ts"].null_count == 0


def test_accepted_values(applied):
    # dbt `accepted_values` analog (schema.yml:16-28)
    _, _, eng, _ = applied
    snap = eng.snapshot_table()
    roles = set(pc.unique(snap["role"]).to_pylist())
    assert roles <= {"user", "assistant", "system", "tool"}
    assert pc.min(snap["turn_idx"]).as_py() >= 0  # in_range/positive_value macro analog


def test_row_count_reconciliation(applied):
    # lineage counters vs generator totals and final state (north rule):
    # every input row is accounted for (valid + rejects = rows_in) and the
    # final row count matches the oracle's insert-minus-delete arithmetic.
    gen, _, eng, rep = applied
    m = eng.metrics()
    ev = gen.events_table()
    assert m["rows_in"] == ev.num_rows
    assert m["valid"] + m["rejects"] == m["rows_in"]
    snap = eng.snapshot_table()
    exp = oracle.replay(ev)
    assert snap.num_rows == exp.num_rows
    # upserts counts per-run winners, an upper bound on live keys
    assert m["upserts"] >= snap.num_rows
    assert m["deletes"] >= 0


def test_rejects_dead_letter(applied):
    _, _, eng, rep = applied
    assert rep.rejects > 0
    reject_files = glob.glob(os.path.join(eng.cfg.path, "p=*", "rejects-*.parquet"))
    assert reject_files
    total = sum(pa.parquet.read_table(f).num_rows for f in reject_files)
    assert total == rep.rejects


def test_fsck(applied):
    _, _, eng, _ = applied
    rep = eng.fsck()
    assert rep["ok"] and rep["issues"] == []

    # leftover tmp + orphan delta (crashed writer) are reclaimable, not failures
    pdir = os.path.join(eng.cfg.path, "p=0000")
    open(os.path.join(pdir, "delta-000099.parquet.tmp"), "w").close()
    import shutil as _sh

    _sh.copy(
        glob.glob(os.path.join(pdir, "delta-*.parquet"))[0],
        os.path.join(pdir, "delta-000098.parquet"),
    )
    rep = eng.fsck()
    assert rep["ok"]
    kinds = {r["kind"] for r in rep["reclaimable"]}
    assert {"tmp_file", "orphan_delta"} <= kinds

    # a committed delta vanishing IS a real issue
    victim = glob.glob(os.path.join(pdir, "delta-*.parquet"))
    victim = [v for v in victim if "000098" not in v][0]
    os.rename(victim, victim + ".bak")
    rep = eng.fsck()
    assert not rep["ok"]
    assert any(i["kind"] == "missing_delta" for i in rep["issues"])
    os.rename(victim + ".bak", victim)
    # vacuum reclaims the remnants, never committed state
    rep = eng.vacuum()
    assert rep["removed"] == 2 and not rep["had_issues"]
    clean = eng.fsck()
    assert clean["ok"] and clean["reclaimable"] == []
    _assert_equal_state(eng, applied[0])  # lake state untouched


def test_get_conversations_bulk_lookup(applied):
    # partition-pruned bulk point reads == the snapshot filtered to the
    # same keys; unknown keys return nothing; empty request is empty
    gen, _, eng, _ = applied
    snap = eng.snapshot_table()
    ids = sorted(set(snap["conv_id"].to_pylist()))[:7]
    got = pa.concat_tables(
        [
            b if isinstance(b, pa.Table) else pa.table(b)
            for b in eng.get_conversations(ids + ["conv-does-not-exist"]).iter_batches(
                batch_format="pyarrow"
            )
        ],
        promote_options="default",
    )
    exp = snap.filter(pc.is_in(snap["conv_id"], value_set=pa.array(ids)))
    cols = sorted(exp.schema.names)
    got = got.select(cols)
    got = got.take(
        pc.sort_indices(got, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert got.equals(exp.select(cols))
    assert eng.get_conversations([]).count() == 0
    assert eng.get_conversations(["conv-does-not-exist"]).count() == 0


def test_rejects_feed(applied):
    # the queryable dead-letter feed: every reject row, group-tagged,
    # with a first-failing-rule reason; exactly-once under re-apply
    gen, wal, eng, rep = applied
    feed = pa.concat_tables(
        [
            b if isinstance(b, pa.Table) else pa.table(b)
            for b in eng.rejects().iter_batches(batch_format="pyarrow")
        ],
        promote_options="default",
    )
    assert feed.num_rows == rep.rejects
    assert feed["reason"].null_count == 0
    assert set(feed["reject_group"].to_pylist()) <= set(rep.epochs)
    # the feed is the set of actually-invalid events
    ev = gen.events_table()
    bad_lsns = sorted(
        r["lsn"] for r in ev.to_pylist() if not oracle.is_valid_event(r)
    )
    assert sorted(feed["lsn"].to_pylist()) == bad_lsns
    # windowing: a window past the last group is empty
    assert eng.rejects(after_epoch=max(rep.epochs)).count() == 0
    # exactly-once: a no-op re-apply adds nothing
    eng.apply(wal)
    assert eng.rejects().count() == rep.rejects


def test_alert_ring_keeps_most_recent_rejects(applied):
    # the capped last-K alert list analog (fraud_detector.py:76-77
    # lpush + ltrim 0..99): metrics() exposes the most recent K rejects,
    # ordered by event recency, exactly-once under re-apply.
    gen, wal, eng, _ = applied
    ring = eng.metrics()["recent_rejects"]
    assert 0 < len(ring) <= 100
    stamps = [(e["ts"] is not None, e["ts"] or 0, e["lsn"]) for e in ring]
    assert stamps == sorted(stamps, reverse=True)
    # ring content == the actually-invalid events, most recent first
    ev = gen.events_table()
    bad_rows = [r for r in ev.to_pylist() if not oracle.is_valid_event(r)]
    expected = sorted(
        bad_rows,
        key=lambda r: (r["ts"] is not None, r["ts"] or 0, r["lsn"]),
        reverse=True,
    )[: len(ring)]
    assert [e["lsn"] for e in ring] == [r["lsn"] for r in expected]
    # exactly-once: a no-op re-apply leaves the ring unchanged
    eng.apply(wal)
    assert eng.metrics()["recent_rejects"] == ring


def test_exactly_once_reapply(applied):
    gen, wal, eng, _ = applied
    before = eng.metrics()
    rep2 = eng.apply(wal)
    assert rep2.epochs == []
    assert eng.metrics() == before
    _assert_equal_state(eng, gen)


def test_crash_resume(tmp_path):
    gen, wal, eng = _build(str(tmp_path), SPEC)
    eng.apply(wal, max_epochs=2)
    # driver crash before global commit markers: remove them all
    for p in glob.glob(os.path.join(eng.cfg.path, "_epochs", "*.json")):
        os.remove(p)
    eng.apply(wal)
    _assert_equal_state(eng, gen)


def test_compaction_preserves_state(applied):
    gen, _, eng, _ = applied
    eng.compact()
    snap = _assert_equal_state(eng, gen)
    # compaction folded every delta away
    assert not glob.glob(os.path.join(eng.cfg.path, "p=*", "delta-*.parquet"))
    assert snap.num_rows > 0


def test_schema_evolution(tmp_path):
    spec = WalSpec(seed=9, num_conversations=60, num_epochs=4, events_per_epoch=600, evolve_at_epoch=2)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    snap = _assert_equal_state(eng, gen)
    assert "model" in snap.schema.names
    assert str(snap.schema.field("turn_idx").type) == "int64"
    # pre-evolution rows read back with null model
    assert snap["model"].null_count > 0


def test_hot_key_skew_salted(tmp_path):
    spec = WalSpec(seed=13, num_conversations=50, num_epochs=2, events_per_epoch=3000, zipf_s=1.5)
    gen, wal, eng = _build(str(tmp_path), spec, salt_shards=4)
    eng.apply(wal)
    _assert_equal_state(eng, gen)


def test_epoch_by_epoch_matches_bulk(tmp_path):
    # applying epoch-at-a-time (micro-batch mode) == one bulk apply
    spec = WalSpec(seed=21, num_conversations=80, num_epochs=3, events_per_epoch=800)
    gen, wal, eng = _build(str(tmp_path), spec)
    for _ in range(spec.num_epochs):
        eng.apply(wal, max_epochs=1)
    _assert_equal_state(eng, gen)


def test_lag_and_follow(tmp_path):
    # lag reports unapplied epochs; follow drains the WAL as epochs land
    spec = WalSpec(seed=31, num_conversations=60, num_epochs=4, events_per_epoch=500)
    gen = WalGenerator(spec)
    wal = str(tmp_path / "wal")
    # only the first two epochs exist initially
    gen.write_epoch(wal, 0)
    gen.write_epoch(wal, 1)
    eng = CdcEngine(LakeConfig.open_or_create(str(tmp_path / "lake"), num_partitions=4))

    lag0 = eng.lag(wal)
    assert lag0["epochs_behind"] == 2 and lag0["committed_head"] is None

    applied = []

    def on_apply(rep):
        applied.append(rep.epochs)
        # epochs 2/3 "arrive" while the tail loop is running
        if len(applied) == 1:
            gen.write_epoch(wal, 2)
            gen.write_epoch(wal, 3)

    reports = eng.follow(wal, poll_interval_s=0.05, max_idle_polls=2, on_apply=on_apply)
    assert [e for r in reports for e in r.epochs] == [0, 1, 2, 3]

    lag1 = eng.lag(wal)
    assert lag1["epochs_behind"] == 0 and lag1["committed_head"] == 3

    # end state equals the oracle over the full log
    snap = eng.snapshot_table()
    exp = oracle.replay(gen.events_table())
    cols = sorted(exp.schema.names)
    assert snap.select(cols).equals(exp.select(cols))


def test_resume_with_new_epochs_after_partial_commit(tmp_path):
    # crash between per-partition commits and the global markers, with NEW
    # epochs landing before the retry: the regrouped apply must skip the
    # partition-committed epochs and still converge to the oracle state
    spec = WalSpec(seed=33, num_conversations=70, num_epochs=4, events_per_epoch=600)
    gen = WalGenerator(spec)
    wal = str(tmp_path / "wal")
    gen.write_epoch(wal, 0)
    gen.write_epoch(wal, 1)
    eng = CdcEngine(LakeConfig.open_or_create(str(tmp_path / "lake"), num_partitions=4))
    eng.apply(wal)
    # simulate the crash: per-partition manifests exist, global markers gone
    for f in glob.glob(os.path.join(eng.cfg.path, "_epochs", "*.json")):
        os.remove(f)
    # new epochs arrive before the retry
    gen.write_epoch(wal, 2)
    gen.write_epoch(wal, 3)
    rep = eng.apply(wal)
    assert rep.epochs == [0, 1, 2, 3]
    # epochs 0/1 were already partition-committed: their rows were filtered
    # inside the merge tasks, so only the new epochs' rows count
    exp = oracle.replay(gen.events_table())
    snap = eng.snapshot_table()
    cols = sorted(exp.schema.names)
    assert snap.select(cols).equals(exp.select(cols))
    # lineage: total rows_in across manifests equals total delivered events
    assert eng.metrics()["rows_in"] == gen.events_table().num_rows


def test_type_widen_text_tool(tmp_path):
    # north-rule evolution case: a later epoch ships text/tool as
    # large_string (and lsn as int64 already) — Arrow unification widens,
    # merge state still equals the oracle
    import pyarrow.parquet as pq

    spec = WalSpec(seed=41, num_conversations=40, num_epochs=2, events_per_epoch=500)
    gen = WalGenerator(spec)
    wal = str(tmp_path / "wal")
    gen.write(wal)
    # rewrite epoch 1's segment with widened string types
    seg = sorted(glob.glob(os.path.join(wal, "epoch=000001", "*.parquet")))[0]
    t = pq.read_table(seg)
    widened = pa.schema(
        [
            pa.field(f.name, pa.large_string())
            if f.name in ("text", "tool", "role", "op", "conv_id")
            else f
            for f in t.schema
        ]
    )
    pq.write_table(t.cast(widened), seg)

    eng = CdcEngine(LakeConfig.open_or_create(str(tmp_path / "lake"), num_partitions=4))
    eng.apply(wal)
    snap = eng.snapshot_table()
    exp = oracle.replay(gen.events_table())
    # compare as-if-narrow: cast snapshot back for value equality
    snap = snap.cast(pa.schema([exp.schema.field(n) for n in snap.schema.names]))
    cols = sorted(exp.schema.names)
    assert snap.select(cols).equals(exp.select(cols))


def _custom_epoch_rows(epoch, rows):
    """Build one WAL epoch table from (lsn, op, conv, turn, ts_us) tuples."""
    from nyc_taxi_data_pipeline_ray import schemas

    return pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "epoch": pa.array([epoch] * len(rows), pa.int32()),
            "conv_id": pa.array([r[2] for r in rows], pa.string()),
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "role": pa.array(
                [None if r[1] == "delete" else "user" for r in rows], pa.string()
            ),
            "text": pa.array(
                [None if r[1] == "delete" else f"text-{r[0]}" for r in rows], pa.string()
            ),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
        },
        schema=schemas.EVENT_SCHEMA,
    )


def _write_custom_wal(wal, epochs_rows):
    import pyarrow.parquet as pq

    tables = []
    for epoch, rows in enumerate(epochs_rows):
        t = _custom_epoch_rows(epoch, rows)
        d = os.path.join(wal, f"epoch={epoch:06d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "part-0000.parquet"))
        tables.append(t)
    return pa.concat_tables(tables)


def test_tombstone_survives_midstream_compaction(tmp_path):
    # ADVICE (high): a delete compacted mid-stream must keep masking a
    # later-epoch out-of-order event carrying an OLDER (ts, lsn) for the
    # same key — the tombstone may not be dropped by auto-compaction.
    T = 1_735_689_600_000_000
    events = _write_custom_wal(
        str(tmp_path / "wal"),
        [
            [(1, "insert", "c1", 0, T), (2, "insert", "c2", 0, T)],
            [(100, "delete", "c1", 0, T + 5_000_000)],
            # ooo update: newer lsn but ts BEFORE the delete -> must lose
            [(200, "update", "c1", 0, T + 1_000_000)],
        ],
    )
    eng = CdcEngine(
        LakeConfig.open_or_create(str(tmp_path / "lake"), num_partitions=2, max_delta_runs=1)
    )
    wal = str(tmp_path / "wal")
    eng.apply(wal, max_epochs=1)
    eng.apply(wal, max_epochs=1)  # commit of epoch 1 auto-compacts (2 runs > 1)
    eng.apply(wal)
    snap = eng.snapshot_table()
    exp = oracle.replay(events)
    cols = sorted(exp.schema.names)
    assert snap.select(cols).equals(exp.select(cols))
    assert "c1" not in snap["conv_id"].to_pylist()  # delete still masks


def test_full_compaction_drops_tombstones(tmp_path):
    T = 1_735_689_600_000_000
    events = _write_custom_wal(
        str(tmp_path / "wal"),
        [
            [(1, "insert", "c1", 0, T), (2, "insert", "c2", 0, T)],
            [(100, "delete", "c1", 0, T + 5_000_000)],
        ],
    )
    eng = CdcEngine(LakeConfig.open_or_create(str(tmp_path / "lake"), num_partitions=2))
    eng.apply(str(tmp_path / "wal"))
    eng.compact(drop_tombstones=True)  # operator asserts the WAL is complete
    snap = eng.snapshot_table()
    exp = oracle.replay(events)
    cols = sorted(exp.schema.names)
    assert snap.select(cols).equals(exp.select(cols))
    # tombstone physically gone from every base run
    for f in glob.glob(os.path.join(eng.cfg.path, "p=*", "base-*.parquet")):
        t = pa.parquet.read_table(f)
        if "op" in t.schema.names:
            assert "delete" not in set(pc.unique(pc.drop_null(t["op"])).to_pylist())


def test_init_rejects_routing_mismatch(tmp_path):
    lake = str(tmp_path / "lake")
    CdcEngine(LakeConfig.open_or_create(lake, num_partitions=4))
    with pytest.raises(ValueError, match="num_partitions"):
        CdcEngine(LakeConfig(lake, num_partitions=8))
    # persisted routing survived the failed open
    assert LakeConfig.load(lake).num_partitions == 4


def test_writer_lease_blocks_concurrent_apply(tmp_path):
    import json

    from nyc_taxi_data_pipeline_ray.engine import LakeLockedError

    spec = WalSpec(seed=61, num_conversations=20, num_epochs=1, events_per_epoch=100)
    gen, wal, eng = _build(str(tmp_path), spec)
    lock = os.path.join(eng.cfg.path, "_lock.json")
    with open(lock, "w") as f:
        json.dump({"pid": os.getpid(), "ts": __import__("time").time()}, f)
    with pytest.raises(LakeLockedError):
        eng.apply(wal)
    # writer queueing: with lease_wait_s the apply WAITS for the live
    # holder instead of failing; release the lock from a timer thread
    import threading
    import time as _time

    threading.Timer(0.5, lambda: os.remove(lock)).start()
    rep = eng.apply(wal, lease_wait_s=10.0)
    assert rep.epochs == [0]
    _assert_equal_state(eng, gen)
    # a dead writer's lock is stolen and the apply proceeds (fresh lake)
    import shutil as _sh

    _sh.rmtree(eng.cfg.path)
    eng2 = CdcEngine(LakeConfig.open_or_create(eng.cfg.path, num_partitions=4))
    lock2 = os.path.join(eng2.cfg.path, "_lock.json")
    with open(lock2, "w") as f:
        json.dump({"pid": 2**22 + 12345, "ts": _time.time()}, f)
    rep = eng2.apply(wal)
    assert rep.epochs == [0]
    assert not os.path.exists(lock2)
    _assert_equal_state(eng2, gen)


def test_salted_resume_rows_in_reconciles(tmp_path):
    # ADVICE (low): with salt_shards > 1 the A2 pre-merge must not sum
    # lineage across epoch boundaries, or a resume-with-new-epochs retry
    # over/under-counts rows_in vs delivered events.
    spec = WalSpec(seed=37, num_conversations=30, num_epochs=4, events_per_epoch=600, zipf_s=1.2)
    gen = WalGenerator(spec)
    wal = str(tmp_path / "wal")
    gen.write_epoch(wal, 0)
    gen.write_epoch(wal, 1)
    eng = CdcEngine(
        LakeConfig.open_or_create(str(tmp_path / "lake"), num_partitions=4, salt_shards=4)
    )
    eng.apply(wal)
    for f in glob.glob(os.path.join(eng.cfg.path, "_epochs", "*.json")):
        os.remove(f)
    gen.write_epoch(wal, 2)
    gen.write_epoch(wal, 3)
    eng.apply(wal)
    _assert_equal_state(eng, gen)
    assert eng.metrics()["rows_in"] == gen.events_table().num_rows


def test_get_conversation_point_lookup(tmp_path):
    spec = WalSpec(seed=51, num_conversations=60, num_epochs=2, events_per_epoch=800)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    exp = oracle.replay(gen.events_table())
    # pick a conversation that survived replay
    conv = exp["conv_id"][0].as_py()
    got = eng.get_conversation(conv)
    want = exp.filter(pc.equal(exp["conv_id"], conv))
    want = want.take(pc.sort_indices(want, sort_keys=[("turn_idx", "ascending")]))
    cols = sorted(want.schema.names)
    assert got.select(cols).equals(want.select(cols))
    # unknown conversation -> empty, correct schema
    assert eng.get_conversation("no_such_conv").num_rows == 0


def test_key_history_lineage(tmp_path):
    """key_history returns every physically-live event for a key with
    correct winner flags: winners reproduce the snapshot's rows, and
    an updated turn shows its superseded versions as non-winners."""
    spec = WalSpec(
        seed=29, num_conversations=40, num_epochs=3, events_per_epoch=800,
        p_update=0.5, ooo_fraction=0.1,
    )
    gen, wal, eng = _build(str(tmp_path), spec)
    # one commit group per epoch: the staged merge collapses history
    # WITHIN a group, so lineage rows survive only across groups
    for _ in range(spec.num_epochs):
        eng.apply(wal, max_epochs=1)
    snap = eng.snapshot_table()
    # pick a key that received events in MORE THAN ONE epoch
    ev = gen.events_table().to_pandas()
    eps = ev.groupby(["conv_id", "turn_idx"])["epoch"].nunique()
    conv = eps[eps > 1].index[0][0]
    hist = eng.key_history(conv)
    assert hist.num_rows > 0 and "is_winner" in hist.schema.names
    win = hist.filter(pc.and_(hist["is_winner"], pc.not_equal(hist["op"], "delete")))
    want = snap.filter(pc.equal(snap["conv_id"], conv))
    cols = sorted(set(want.schema.names) & set(win.schema.names) - {"is_winner"})
    win_s = win.select(cols).take(
        pc.sort_indices(win.select(cols), sort_keys=[("turn_idx", "ascending")])
    )
    want_s = want.select(cols).take(
        pc.sort_indices(want.select(cols), sort_keys=[("turn_idx", "ascending")])
    )
    assert win_s.equals(want_s)
    # at least one turn of this conv carries superseded history
    n_events = hist.num_rows
    n_turns = len(set(hist["turn_idx"].to_pylist()))
    assert n_events > n_turns  # updates present -> losers retained
    # unknown key -> empty with flag column
    assert eng.key_history("no-such-conv").num_rows == 0


def test_export_snapshot_exactly_once(tmp_path):
    """Exported snapshot == lake state; re-export of an unchanged lake
    is a skip; a new commit re-exports; a crashed export (no marker)
    simply rewrites."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as pq

    spec = WalSpec(seed=19, num_conversations=60, num_epochs=2, events_per_epoch=700)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal, max_epochs=1)
    out = os.path.join(str(tmp_path), "export")
    r1 = eng.export_snapshot(out)
    assert not r1["skipped"]
    files = sorted(_glob.glob(os.path.join(out, "part-p*.parquet")))
    assert len(files) == len(eng._live_pids())  # one file per partition
    got = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
    snap = eng.snapshot_table()
    cols = sorted(c for c in snap.schema.names if not c.startswith("_"))
    got = got.select(cols).take(
        pc.sort_indices(
            got.select(cols),
            sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
        )
    )
    assert got.equals(snap.select(cols))

    assert eng.export_snapshot(out)["skipped"]  # unchanged lake: no-op
    eng.apply(wal)
    r3 = eng.export_snapshot(out)
    assert not r3["skipped"] and r3["checksum"] != r1["checksum"]
    # crash: marker gone -> rewrite, same committed content
    os.remove(os.path.join(out, "_SUCCESS"))
    r4 = eng.export_snapshot(out)
    assert not r4["skipped"] and r4["checksum"] == r3["checksum"]
    marker = _json.load(open(os.path.join(out, "_SUCCESS")))
    assert marker["checksum"] == r4["checksum"]

    # exporting a fewer-partition lake into the SAME dir removes stale
    # part files (no pollution for glob-reading consumers).  Identical
    # content skips regardless of layout (checksum is layout-invariant)
    eng2 = eng.reshard(os.path.join(str(tmp_path), "lake2"), 2)
    assert eng2.export_snapshot(out)["skipped"]
    os.remove(os.path.join(out, "_SUCCESS"))  # force the rewrite
    r5 = eng2.export_snapshot(out)
    assert not r5["skipped"] and r5["checksum"] == r4["checksum"]
    files2 = sorted(_glob.glob(os.path.join(out, "part-p*.parquet")))
    assert len(files2) == len(eng2._live_pids()) <= 2
    got2 = pa.concat_tables(
        [pq.read_table(f) for f in files2], promote_options="default"
    )
    assert got2.num_rows == eng.snapshot_table().num_rows


def test_wal_gc(tmp_path):
    """GC deletes only fully-committed epoch dirs below the first gap,
    and replay semantics are unchanged (re-apply is a no-op; a new
    epoch after GC still applies)."""
    spec = WalSpec(seed=41, num_conversations=50, num_epochs=3, events_per_epoch=500)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal, max_epochs=2)
    rep = eng.wal_gc(wal)
    assert rep["removed"] == 2 and rep["kept"] == 1
    assert len(eng.discover(wal)) == 1  # uncommitted epoch survived
    before = eng.checksum()
    assert eng.apply(wal).epochs == [2]
    _assert_equal_state(eng, gen)
    assert eng.wal_gc(wal) == {"removed": 1, "kept": 0}
    assert eng.discover(wal) == []
    assert eng.apply(wal).epochs == []  # nothing left, still a no-op
    assert eng.checksum() != before  # epoch 2 did land


def test_reshard_convergence(tmp_path):
    """Scale-out repartitioning: the resharded lake holds the same
    state (checksum + snapshot equality), keeps serving pruned lookups,
    skips already-applied epochs, and CONVERGES with the source when
    the remaining WAL epochs are applied to both under the new
    partitioning — including late out-of-order events that must stay
    masked by moved tombstones."""
    spec = WalSpec(
        seed=67,
        num_conversations=120,
        num_epochs=3,
        events_per_epoch=1200,
        p_update=0.3,
        p_delete=0.1,
        ooo_fraction=0.15,
    )
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal, max_epochs=2)

    tgt = os.path.join(str(tmp_path), "lake7")
    eng2 = eng.reshard(tgt, 7)
    assert eng2.cfg.num_partitions == 7

    assert eng2.checksum() == eng.checksum()
    cols = sorted(f.name for f in __import__(
        "nyc_taxi_data_pipeline_ray.schemas", fromlist=["TRANSCRIPT_SCHEMA"]
    ).TRANSCRIPT_SCHEMA)
    snap_a = eng.snapshot_table().select(cols)
    snap_b = eng2.snapshot_table().select(cols)
    assert snap_a.equals(snap_b)

    # already-applied epochs are skipped on the target
    assert eng2.discover(wal) == eng.discover(wal)
    assert len(eng2.discover(wal)) == 1

    # pruned point lookup on the resharded layout
    conv = snap_b["conv_id"][0].as_py()
    got = eng2.get_conversation(conv)
    want = snap_b.filter(pc.equal(snap_b["conv_id"], conv))
    want = want.take(pc.sort_indices(want, sort_keys=[("turn_idx", "ascending")]))
    assert got.select(cols).equals(want.select(cols))

    # converge: remaining epoch (with ooo events) applied to both
    eng.apply(wal)
    eng2.apply(wal)
    assert eng2.checksum() == eng.checksum()
    _assert_equal_state(eng2, gen)

    # target path collision is refused
    with pytest.raises(ValueError):
        eng.reshard(tgt, 3)


def test_bloom_sidecar_skips_absent_keys(tmp_path):
    """Compaction writes a per-base key bloom; a lookup for a key the
    partition never held skips the base read entirely (no false
    negatives: present keys always pass)."""
    from nyc_taxi_data_pipeline_ray.engine import (
        _bloom_filter_keys,
        _bloom_path,
        _partition_run_paths,
        hash_partition_ids,
    )

    spec = WalSpec(seed=91, num_conversations=80, num_epochs=2, events_per_epoch=900)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    eng.compact(force=True)

    snap = eng.snapshot_table()
    present = sorted(set(snap["conv_id"].to_pylist()))
    # a key lexicographically inside the base's [min, max] range that
    # was never written: min/max pruning can't reject it, bloom must
    ghost = present[0] + "-ghost"
    assert present[0] < ghost < present[-1]

    for pid in eng._live_pids():
        paths = _partition_run_paths(eng.cfg.path, pid)
        base = paths[0]
        assert os.path.exists(_bloom_path(base)), "compaction must write the sidecar"
        assert _bloom_filter_keys(base, [ghost]) == []
        in_pid = [
            c
            for c in present
            if int(hash_partition_ids(pa.array([c]), eng.cfg.num_partitions)[0]) == pid
        ]
        if in_pid:
            kept = _bloom_filter_keys(base, [in_pid[0], ghost])
            assert in_pid[0] in kept and ghost not in kept

    # end-to-end: ghost lookup is empty, real lookups unaffected
    assert eng.get_conversation(ghost).num_rows == 0
    conv = present[0]
    got = eng.get_conversation(conv)
    want = snap.filter(pc.equal(snap["conv_id"], conv))
    want = want.take(pc.sort_indices(want, sort_keys=[("turn_idx", "ascending")]))
    cols = sorted(want.schema.names)
    assert got.select(cols).equals(want.select(cols))


def test_row_group_pruned_lookup(tmp_path):
    """Compacted bases are key-sorted with bounded row groups; a point
    lookup reads only the groups whose footer [min,max] conv_id range
    can hold the requested keys — and stays exactly equal to the
    filtered snapshot."""
    from nyc_taxi_data_pipeline_ray.engine import (
        _partition_run_paths,
        _read_keys_pruned,
        _read_run_pruned,
        hash_partition_ids,
    )

    spec = WalSpec(seed=77, num_conversations=300, num_epochs=2, events_per_epoch=3000)
    gen = WalGenerator(spec)
    wal = os.path.join(str(tmp_path), "wal")
    gen.write(wal)
    eng = CdcEngine(
        LakeConfig.open_or_create(
            os.path.join(str(tmp_path), "lake"),
            num_partitions=2,
            base_row_group_rows=64,
        )
    )
    eng.apply(wal)
    eng.compact(force=True)

    snap = eng.snapshot_table()
    conv = snap["conv_id"][0].as_py()
    pid = int(hash_partition_ids(pa.array([conv]), eng.cfg.num_partitions)[0])

    # the base really has multiple bounded row groups ...
    base = _partition_run_paths(eng.cfg.path, pid)[0]
    t, read, total = _read_run_pruned(base, [conv])
    assert total >= 4, f"base has only {total} row groups"
    # ... and the lookup touched a strict subset of them
    assert 0 < read < total, (read, total)

    # pruned merged state == filtered snapshot, for single and bulk
    got = eng.get_conversation(conv)
    want = snap.filter(pc.equal(snap["conv_id"], conv))
    want = want.take(pc.sort_indices(want, sort_keys=[("turn_idx", "ascending")]))
    cols = sorted(want.schema.names)
    assert got.select(cols).equals(want.select(cols))

    ids = sorted(set(snap["conv_id"].to_pylist()))[:9]
    merged, _, _ = _read_keys_pruned(
        eng.cfg.path, pid, [c for c in ids] + ["missing-key"]
    )
    in_pid = [
        c
        for c in ids
        if int(hash_partition_ids(pa.array([c]), eng.cfg.num_partitions)[0]) == pid
    ]
    exp = snap.filter(pc.is_in(snap["conv_id"], value_set=pa.array(in_pid)))
    merged = merged.take(
        pc.sort_indices(
            merged, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
    assert merged.select(cols).equals(exp.select(cols))


def test_time_travel_snapshot_matches_prefix_oracle(tmp_path):
    gen, wal, eng = _build(str(tmp_path), SPEC)
    for _ in range(SPEC.num_epochs):
        eng.apply(wal, max_epochs=1)
    events = gen.events_table()
    for k in range(SPEC.num_epochs):
        snap = eng.snapshot_table(as_of_epoch=k)
        exp = oracle.replay(events.filter(pc.less_equal(events["epoch"], k)))
        cols = sorted(exp.schema.names)
        assert snap.select(cols).equals(exp.select(cols)), f"as_of_epoch={k}"
    # latest as-of == current state
    assert eng.snapshot_table(as_of_epoch=SPEC.num_epochs - 1).equals(eng.snapshot_table())


def test_time_travel_rejects_mid_group_and_compacted_history(tmp_path):
    gen, wal, eng = _build(str(tmp_path), SPEC)
    eng.apply(wal)  # all 3 epochs commit as ONE group (group_id = 2)
    with pytest.raises(Exception, match="inside commit group"):
        eng.snapshot_table(as_of_epoch=1)
    # boundary epoch is fine
    snap = eng.snapshot_table(as_of_epoch=2)
    assert snap.num_rows > 0
    # compaction folds the history away -> earlier as-of raises
    eng.compact(force=True)
    with pytest.raises(Exception, match="compact"):
        eng.snapshot_table(as_of_epoch=1)


def test_change_feed_reconstructs_state(tmp_path):
    from nyc_taxi_data_pipeline_ray.state import merge as mg

    gen, wal, eng = _build(str(tmp_path), SPEC)
    for _ in range(SPEC.num_epochs):
        eng.apply(wal, max_epochs=1)
    feed = mg.concat_unified(
        [
            b
            for b in eng.changes().iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
        ]
    )
    groups = sorted(set(feed["change_group"].to_pylist()))
    assert groups == [0, 1, 2]
    # replaying the full feed (oldest group first) rebuilds the lake state
    runs = [
        feed.filter(pc.equal(feed["change_group"], g)).drop_columns(["change_group"])
        for g in groups
    ]
    rebuilt = mg.merge_runs(runs, drop_tombstones=True)
    rebuilt = rebuilt.drop_columns(
        [c for c in ("op", "epoch") if c in rebuilt.schema.names]
    )
    rebuilt = mg.sort_by_key(rebuilt)
    snap = eng.snapshot_table()
    cols = sorted(snap.schema.names)
    assert rebuilt.select(cols).equals(snap.select(cols))
    # incremental window: only groups after the consumer's watermark
    tail = mg.concat_unified(
        [
            b
            for b in eng.changes(after_epoch=0).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if b.num_rows
        ]
    )
    assert sorted(set(tail["change_group"].to_pylist())) == [1, 2]


def test_change_feed_compaction_guard(tmp_path):
    gen, wal, eng = _build(str(tmp_path), SPEC)
    eng.apply(wal)
    eng.compact(force=True)
    with pytest.raises(Exception, match="folded into the base"):
        eng.changes(after_epoch=-1).materialize()
    # at-or-above the watermark: empty feed, no error
    assert eng.changes(after_epoch=SPEC.num_epochs - 1).count() == 0


def test_time_travel_across_schema_evolution(tmp_path):
    spec = WalSpec(seed=9, num_conversations=60, num_epochs=4, events_per_epoch=600, evolve_at_epoch=2)
    gen, wal, eng = _build(str(tmp_path), spec)
    for _ in range(spec.num_epochs):
        eng.apply(wal, max_epochs=1)
    events = gen.events_table()
    # pre-evolution snapshot: no v2 'model' column in any committed delta
    pre = eng.snapshot_table(as_of_epoch=1)
    assert "model" not in pre.schema.names
    exp = oracle.replay(events.filter(pc.less_equal(events["epoch"], 1)))
    cols = sorted(set(pre.schema.names) & set(exp.schema.names))
    # pre-evolution state legitimately keeps the narrow v1 turn_idx:int32;
    # the oracle ran over the unified (widened) events table — compare values
    target = pa.schema([exp.schema.field(c) for c in cols])
    assert pre.select(cols).cast(target).equals(exp.select(cols))
    # post-evolution snapshot carries the evolved column and full equality
    post = eng.snapshot_table(as_of_epoch=3)
    assert "model" in post.schema.names
    exp2 = oracle.replay(events)
    cols2 = sorted(exp2.schema.names)
    assert post.select(cols2).equals(exp2.select(cols2))


def test_describe_reports_physical_stats(tmp_path):
    gen, wal, eng = _build(str(tmp_path), SPEC)
    for _ in range(SPEC.num_epochs):
        eng.apply(wal, max_epochs=1)
    d = eng.describe()
    assert d["partitions"] == 4
    assert d["max_delta_runs"] >= 1
    assert d["total_bytes"] > 0
    # footer row counts cover every live row (upserts incl. superseded
    # versions across runs >= final distinct keys)
    assert d["total_rows"] >= eng.snapshot_table().num_rows
    eng.compact(force=True)
    d2 = eng.describe()
    assert d2["max_delta_runs"] == 0
    assert all(p["base_generation"] is not None for p in d2["per_partition"])


def test_incremental_feed_on_time_travel_base(tmp_path):
    # the consumer-sync invariant: snapshot(as_of=k) + changes(after=k)
    # replayed through the LWW merge == the current lake state
    from nyc_taxi_data_pipeline_ray.state import merge as mg

    gen, wal, eng = _build(str(tmp_path), SPEC)
    for _ in range(SPEC.num_epochs):
        eng.apply(wal, max_epochs=1)
    base = eng.snapshot_table(as_of_epoch=0)
    base = base.append_column("op", pa.array(["insert"] * base.num_rows))
    feed = mg.concat_unified(
        [
            b
            for b in eng.changes(after_epoch=0).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if b.num_rows
        ]
    )
    groups = sorted(set(feed["change_group"].to_pylist()))
    runs = [base] + [
        feed.filter(pc.equal(feed["change_group"], g)).drop_columns(["change_group"])
        for g in groups
    ]
    rebuilt = mg.merge_runs(runs, drop_tombstones=True)
    rebuilt = mg.sort_by_key(
        rebuilt.drop_columns([c for c in ("op", "epoch") if c in rebuilt.schema.names])
    )
    snap = eng.snapshot_table()
    cols = sorted(snap.schema.names)
    assert rebuilt.select(cols).equals(snap.select(cols))


def test_backfill_through_cdc_path(tmp_path):
    """backfill() = bulk correction as a derived update epoch: state size
    unchanged, corrected values present, pre-backfill state still
    time-travelable, re-apply a no-op."""
    import pandas as pd

    gen, wal, eng = _build(str(tmp_path), WalSpec(seed=11, num_conversations=80,
                                                  num_epochs=2, events_per_epoch=800))
    eng.apply(wal)
    snap0 = eng.snapshot_table()
    n_assist0 = snap0.filter(pc.equal(snap0["role"], "assistant")).num_rows
    assert n_assist0 > 0

    def fix(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t["role"], "assistant"))
        return sel.set_column(
            sel.schema.get_field_index("role"),
            "role",
            pa.array(["system"] * sel.num_rows),
        )

    ts = pd.Timestamp(pc.max(snap0["ts"]).as_py()) + pd.Timedelta(seconds=1)
    epoch, rep = eng.backfill(wal, fix, ts=ts)
    assert epoch is not None and rep.rejects == 0
    snap1 = eng.snapshot_table()
    assert snap1.num_rows == snap0.num_rows
    assert snap1.filter(pc.equal(snap1["role"], "assistant")).num_rows == 0
    assert (
        snap1.filter(pc.equal(snap1["role"], "system")).num_rows
        >= n_assist0
    )
    # time travel: the pre-backfill state is still reachable
    pre = eng.snapshot_table(as_of_epoch=epoch - 1)
    assert pre.filter(pc.equal(pre["role"], "assistant")).num_rows == n_assist0
    # exactly-once: the derived epoch doesn't re-apply
    assert eng.apply(wal).epochs == []


def test_purge_retention_ttl(tmp_path):
    """purge() tombstones exactly the keys whose winner predates the
    cutoff; compaction preserves the post-purge state; an all-younger
    cutoff emits no epoch."""
    import pandas as pd

    gen, wal, eng = _build(str(tmp_path), WalSpec(seed=12, num_conversations=80,
                                                  num_epochs=2, events_per_epoch=800))
    eng.apply(wal)
    snap0 = eng.snapshot_table()
    med = pd.Series(snap0["ts"].to_pandas()).median()
    epoch, rep = eng.purge(wal, older_than=med)
    assert epoch is not None and rep.rejects == 0 and rep.deletes > 0
    snap1 = eng.snapshot_table()
    exp = snap0.filter(pc.greater_equal(snap0["ts"], pa.scalar(med.to_datetime64())))
    assert snap1.num_rows == exp.num_rows
    assert snap1.select(["conv_id", "turn_idx"]).equals(
        exp.select(["conv_id", "turn_idx"])
    )
    # physical reclaim keeps the logical state
    eng.compact()
    snap2 = eng.snapshot_table()
    assert snap2.equals(snap1)
    # nothing older than epoch-0 time: no epoch emitted
    ep_none, _ = eng.purge(wal, older_than=pd.Timestamp("1990-01-01"))
    assert ep_none is None


def test_checksum_partition_invariant(tmp_path):
    """The anti-entropy checksum is a content digest: identical WALs
    replayed into lakes with DIFFERENT partition counts (different file
    layout, merge order, task split) produce the SAME digest; a single
    extra update changes it."""
    import os

    spec = WalSpec(seed=21, num_conversations=60, num_epochs=2, events_per_epoch=600)
    sums = []
    for np_ in (2, 8):
        tmp = os.path.join(str(tmp_path), f"p{np_}")
        gen = WalGenerator(spec)
        wal = os.path.join(tmp, "wal")
        gen.write(wal)
        eng = CdcEngine(
            LakeConfig.open_or_create(os.path.join(tmp, "lake"), num_partitions=np_)
        )
        eng.apply(wal)
        sums.append(eng.checksum())
    assert sums[0] == sums[1]
    assert sums[0]["rows"] > 0

    # one backfilled row flips the digest
    import pandas as pd

    tmp = os.path.join(str(tmp_path), "p8")
    eng = CdcEngine(LakeConfig.load(os.path.join(tmp, "lake")))

    def touch_one(t: pa.Table) -> pa.Table:
        one = t.slice(0, min(1, t.num_rows))
        if one.num_rows == 0:
            return one
        return one.set_column(
            one.schema.get_field_index("text"), "text", pa.array(["EDITED"])
        )

    eng.backfill(
        os.path.join(tmp, "wal"), touch_one, ts=pd.Timestamp("2030-01-01")
    )
    assert eng.checksum() != sums[0]


def test_incremental_replication_converges(tmp_path):
    """Replication loop: export lake A's change feed per watermark
    window into lake B's WAL (different partition count) and apply;
    after each window the anti-entropy checksums match — rows move once,
    verification moves 8 bytes."""
    import os

    spec = WalSpec(seed=31, num_conversations=60, num_epochs=3, events_per_epoch=500)
    gen, wal_a, eng_a = _build(str(tmp_path), spec)
    wal_b = os.path.join(str(tmp_path), "wal_b")
    eng_b = CdcEngine(
        LakeConfig.open_or_create(os.path.join(str(tmp_path), "lake_b"), num_partitions=8)
    )

    # window 1: first commit group only
    eng_a.apply(wal_a, max_epochs=1)
    assert eng_a.export_changes_as_wal(wal_b, after_epoch=-1, through_epoch=0) is not None
    eng_b.apply(wal_b)
    assert eng_a.checksum() == eng_b.checksum()

    # window 2: the rest
    eng_a.apply(wal_a)
    assert eng_a.export_changes_as_wal(wal_b, after_epoch=0) is not None
    eng_b.apply(wal_b)
    assert eng_a.checksum() == eng_b.checksum()
    # and B's state equals the full oracle
    exp = oracle.replay(gen.events_table())
    cols = sorted(exp.schema.names)
    assert eng_b.snapshot_table().select(cols).equals(exp.select(cols))


def test_antientropy_diff_between_replicas(tmp_path):
    """Merkle-style anti-entropy: per-partition digests agree on
    converged replicas; after the target misses an epoch, the diff
    names exactly the diverged keys — computed only over mismatched
    partitions — and replication repairs it back to digest equality."""
    from nyc_taxi_data_pipeline_ray.engine import _diff_states  # noqa: F401

    spec = WalSpec(
        seed=83, num_conversations=60, num_epochs=2, events_per_epoch=900,
        p_update=0.4, p_delete=0.1,
    )
    gen, wal, eng = _build(str(tmp_path), spec)
    for _ in range(spec.num_epochs):  # one commit group per epoch
        eng.apply(wal, max_epochs=1)

    # replica: full convergence via replication
    twal = os.path.join(str(tmp_path), "twal")
    tlake = os.path.join(str(tmp_path), "tlake")
    eng.export_changes_as_wal(twal, after_epoch=-1)
    eng2 = CdcEngine(LakeConfig.open_or_create(tlake, num_partitions=4))
    eng2.apply(twal)
    assert eng.checksum_partitions() == eng2.checksum_partitions()
    assert eng.antientropy_diff(eng2).num_rows == 0

    # diverge: a stale replica holding only epoch 0
    s_wal = os.path.join(str(tmp_path), "swal")
    s_lake = os.path.join(str(tmp_path), "slake")
    eng.export_changes_as_wal(s_wal, after_epoch=-1, through_epoch=0)
    eng3 = CdcEngine(LakeConfig.open_or_create(s_lake, num_partitions=4))
    eng3.apply(s_wal)
    d = eng.antientropy_diff(eng3)
    assert d.num_rows > 0
    # the diverged keys are exactly the keys whose winner changed
    # between epoch 0 and now on the source
    exp = pa.concat_tables(
        [
            b if isinstance(b, pa.Table) else pa.table(b)
            for b in eng.diff(from_epoch=0).iter_batches(batch_format="pyarrow")
        ],
        promote_options="default",
    )
    got_keys = set(zip(d["conv_id"].to_pylist(), d["turn_idx"].to_pylist()))
    exp_keys = set(zip(exp["conv_id"].to_pylist(), exp["turn_idx"].to_pylist()))
    assert got_keys == exp_keys

    # repair: ship the missing window into the replica's feed (epoch
    # numbers accumulate per feed dir), digests re-converge
    eng.export_changes_as_wal(s_wal, after_epoch=0)
    eng3.apply(s_wal)
    assert eng.antientropy_diff(eng3).num_rows == 0

    # layout mismatch is refused
    eng7 = eng.reshard(os.path.join(str(tmp_path), "lake7"), 7)
    with pytest.raises(ValueError):
        eng.antientropy_diff(eng7)


def test_reshard_with_evolved_schema(tmp_path):
    """Reshard a lake whose WAL evolved mid-stream (added `model`
    column, widened turn_idx): the moved bases carry the evolved
    schema and the remaining epochs still converge on the new
    layout."""
    spec = WalSpec(
        seed=97,
        num_conversations=60,
        num_epochs=3,
        events_per_epoch=700,
        evolve_at_epoch=1,
        p_update=0.3,
    )
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal, max_epochs=2)  # evolution included
    eng2 = eng.reshard(os.path.join(str(tmp_path), "lake5"), 5)
    assert eng2.checksum() == eng.checksum()
    snap2 = eng2.snapshot_table()
    assert "model" in snap2.schema.names
    eng.apply(wal)
    eng2.apply(wal)
    assert eng2.checksum() == eng.checksum()
    _assert_equal_state(eng2, gen)


def test_checksum_encoding_injective_across_columns():
    """The canonical checksum row encoding is length-prefixed, so values
    that straddle column boundaries cannot collide: ('a|b','c') and
    ('a','b|c') must produce different digests (ADVICE: un-escaped
    '|'-joins let divergent replicas checksum equal)."""
    from nyc_taxi_data_pipeline_ray.engine import _canon_rows, _fold_md5_xor

    a = pa.table({"x": ["a|b"], "y": ["c"]})
    b = pa.table({"x": ["a"], "y": ["b|c"]})
    ea, eb = _canon_rows(a, ["x", "y"]), _canon_rows(b, ["x", "y"])
    assert ea.to_pylist() != eb.to_pylist()
    assert _fold_md5_xor(ea) != _fold_md5_xor(eb)
    # and the ':' in the prefix itself can't be confused with data
    c = pa.table({"x": ["1:"], "y": [""]})
    d = pa.table({"x": ["1"], "y": [":"]})
    assert _canon_rows(c, ["x", "y"]).to_pylist() != _canon_rows(d, ["x", "y"]).to_pylist()


def test_replication_epoch_numbered_past_target_after_feed_gc(tmp_path):
    """Epoch-number reuse regression (ADVICE engine.py:1154): export
    window 1, target applies + wal-gc's its feed, then export window 2.
    With the epoch derived from the SOURCE's ledger both windows get the
    same number and the target silently skips window 2; deriving it from
    the TARGET's committed ledger keeps replication converging."""
    spec = WalSpec(seed=53, num_conversations=40, num_epochs=2, events_per_epoch=400)
    gen, wal, eng_a = _build(str(tmp_path), spec)
    # source fully applied BEFORE either export, one commit group per
    # epoch so the change feed can be windowed at epoch granularity
    eng_a.apply(wal, max_epochs=1)
    eng_a.apply(wal)
    feed = os.path.join(str(tmp_path), "feed")
    eng_b = CdcEngine(
        LakeConfig.open_or_create(os.path.join(str(tmp_path), "lakeb"), num_partitions=4)
    )
    e1 = eng_a.export_changes_as_wal(feed, through_epoch=0, target=eng_b)
    assert e1 is not None
    assert eng_b.apply(feed).epochs == [e1]
    eng_b.wal_gc(feed)  # supported flow: the applied feed epoch is reclaimed

    e2 = eng_a.export_changes_as_wal(feed, after_epoch=0, target=eng_b)
    assert e2 is not None and e2 > e1  # new TO THE TARGET despite the empty feed dir
    assert eng_b.apply(feed).epochs == [e2]
    assert eng_a.checksum() == eng_b.checksum()
    # explicit caller-supplied epoch (replication watermark) also works
    e3 = eng_a.export_changes_as_wal(feed, after_epoch=-1, epoch=e2 + 7)
    assert e3 == e2 + 7


def test_reshard_crash_is_detectable_and_retryable(tmp_path, monkeypatch):
    """Completion-marker ordering (ADVICE engine.py:1462): a reshard that
    crashes mid-way must NOT leave a target that looks like a healthy
    lake, and the retry must succeed instead of failing on 'already
    exists'."""
    import nyc_taxi_data_pipeline_ray.engine as E

    spec = WalSpec(seed=59, num_conversations=40, num_epochs=2, events_per_epoch=400)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    tgt = os.path.join(str(tmp_path), "tgt")

    def boom(*a, **k):
        raise RuntimeError("simulated crash during _epochs copy")

    monkeypatch.setattr(E.shutil, "copyfile", boom)
    with pytest.raises(RuntimeError):
        eng.reshard(tgt, 2)
    # half-built target: data may exist but the completion marker must not
    assert os.path.isdir(tgt)
    assert not os.path.exists(os.path.join(tgt, "_lake.json"))
    monkeypatch.undo()

    eng2 = eng.reshard(tgt, 2)  # retry sweeps the crashed attempt and rebuilds
    assert os.path.exists(os.path.join(tgt, "_lake.json"))
    assert eng2.checksum() == eng.checksum()
    _assert_equal_state(eng2, gen)


def test_export_snapshot_invalidates_marker_before_rewrite(tmp_path, monkeypatch):
    """Exactly-once export (ADVICE engine.py:1292): once a rewrite
    starts, the OLD _SUCCESS marker must already be gone — a crash
    mid-rewrite may never leave a valid marker over torn part files.
    Also: the export takes the single-writer lease, so no apply can
    interleave between the checksum pass and the partition reads."""
    from nyc_taxi_data_pipeline_ray.engine import LakeLockedError, _LakeLease

    spec = WalSpec(seed=61, num_conversations=40, num_epochs=2, events_per_epoch=400)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal, max_epochs=1)
    out = os.path.join(str(tmp_path), "export")
    assert not eng.export_snapshot(out)["skipped"]
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    eng.apply(wal)  # change the lake so the next export rewrites

    real_live = eng._live_pids
    calls = {"n": 0}

    def boom(*a, **k):
        # call 1 is checksum()'s snapshot; call 2 is the export's own
        # partition listing — AFTER the marker invalidation, BEFORE any
        # part file is (re)written
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash before part writes")
        return real_live()

    monkeypatch.setattr(eng, "_live_pids", boom)
    with pytest.raises(RuntimeError):
        eng.export_snapshot(out)
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))  # invalidated first
    monkeypatch.undo()

    r = eng.export_snapshot(out)
    assert not r["skipped"]
    assert r["checksum"] == eng.checksum()["checksum"]

    # the export respects the lake's single-writer lease
    with _LakeLease(eng.cfg.path):
        with pytest.raises(LakeLockedError):
            eng.export_snapshot(out)


def test_pruned_point_lookups_retry_compactor_race(tmp_path, monkeypatch):
    """Reader-vs-compactor guard for the PRUNED read path (ADVICE
    engine.py:2355): one FileNotFoundError (compactor unlinked a listed
    base) triggers a re-list + re-read instead of raising."""
    import nyc_taxi_data_pipeline_ray.engine as E

    spec = WalSpec(seed=67, num_conversations=40, num_epochs=2, events_per_epoch=400)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    key = eng.snapshot_table()["conv_id"][0].as_py()

    real = E._read_run_pruned
    calls = {"fail": 0}

    def flaky(path, keys, column="conv_id"):
        if calls["fail"] == 0:
            calls["fail"] += 1
            raise FileNotFoundError(path)
        return real(path, keys, column)

    monkeypatch.setattr(E, "_read_run_pruned", flaky)
    t = eng.get_conversation(key)
    assert calls["fail"] == 1 and t.num_rows > 0

    calls["fail"] = 0
    h = eng.key_history(key)
    assert calls["fail"] == 1 and h.num_rows > 0


def test_event_time_watermark_and_lateness(tmp_path):
    """Per-partition-epoch manifests carry the event-time watermark
    (max_ts_us — exact through the pre-shuffle combiner) and the
    late-arrival count vs the lake's prior watermark (late_upserts);
    both match an independent pandas recomputation and stay stable
    across idempotent re-apply and crash-retry."""
    from nyc_taxi_data_pipeline_ray.stages.validate import split_valid
    from nyc_taxi_data_pipeline_ray.state import manifest as mf

    spec = WalSpec(
        seed=11,
        num_conversations=80,
        num_epochs=3,
        events_per_epoch=800,
        ooo_fraction=0.3,
        dup_fraction=0.1,
        invalid_fraction=0.05,
    )
    gen, wal, eng = _build(str(tmp_path), spec)
    for _ in range(spec.num_epochs):
        eng.apply(wal, max_epochs=1)

    good, _ = split_valid(gen.events_table())
    df = good.select(["conv_id", "turn_idx", "ts", "lsn", "epoch"]).to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    # expected per-epoch watermark: max valid event time in the epoch
    wm = df.groupby("epoch")["ts_us"].max()
    # expected late winners: LWW winner per (epoch, key) with event time
    # at/below the running watermark of all PRIOR epochs
    winners = (
        df.sort_values(["epoch", "conv_id", "turn_idx", "ts_us", "lsn"])
        .groupby(["epoch", "conv_id", "turn_idx"], as_index=False)
        .last()
    )
    got = {e: {"watermark_us": None, "late_upserts": 0} for e in wm.index}
    for pid in range(eng.cfg.num_partitions):
        for m in mf.read_manifests(eng.cfg.path, pid):
            e = int(m["epochs"][0])
            c = m.get("counters", {})
            v = c.get("max_ts_us")
            if v is not None:
                cur = got[e]["watermark_us"]
                got[e]["watermark_us"] = v if cur is None else max(cur, v)
            got[e]["late_upserts"] += int(c.get("late_upserts", 0))
    prior = None
    for e in sorted(wm.index):
        assert got[e]["watermark_us"] == int(wm[e]), e
        w_e = winners[winners["epoch"] == e]
        exp_late = 0 if prior is None else int((w_e["ts_us"] <= prior).sum())
        assert got[e]["late_upserts"] == exp_late, e
        prior = int(wm[e]) if prior is None else max(prior, int(wm[e]))

    # crash-retry: drop global markers AND the watermark cache — the
    # committed manifests (authoritative) must not change
    before = [
        sorted(
            (m["group_id"], m["counters"].get("late_upserts", 0))
            for m in mf.read_manifests(eng.cfg.path, pid)
        )
        for pid in range(eng.cfg.num_partitions)
    ]
    for p in glob.glob(os.path.join(eng.cfg.path, "_epochs", "*.json")):
        os.remove(p)
    os.remove(os.path.join(eng.cfg.path, "_watermark.json"))
    eng.apply(wal)
    after = [
        sorted(
            (m["group_id"], m["counters"].get("late_upserts", 0))
            for m in mf.read_manifests(eng.cfg.path, pid)
        )
        for pid in range(eng.cfg.num_partitions)
    ]
    assert before == after
    _assert_equal_state(eng, gen)


def test_merge_counters_folds_bounds():
    from nyc_taxi_data_pipeline_ray.state.manifest import merge_counters

    ms = [
        {"counters": {"rows_in": 3, "min_lsn": 5, "max_lsn": 9, "max_ts_us": 100}},
        {"counters": {"rows_in": 4, "min_lsn": 2, "max_lsn": 11, "max_ts_us": 70}},
        {"counters": {"rows_in": 1}},
    ]
    out = merge_counters(ms)
    assert out == {
        "rows_in": 8,
        "min_lsn": 2,
        "max_lsn": 11,
        "max_ts_us": 100,
    }


def test_watermark_survives_reshard(tmp_path):
    """Reshard's bootstrap manifests preserve the event-time watermark
    (max_ts_us), so late-arrival accounting doesn't reset after a
    layout change."""
    spec = WalSpec(
        seed=5, num_conversations=60, num_epochs=2,
        events_per_epoch=500, ooo_fraction=0.3,
    )
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    w_src = eng._event_watermark(before_group=10**6)
    tgt = eng.reshard(os.path.join(str(tmp_path), "lake2"), 8)
    assert w_src is not None
    assert tgt._event_watermark(before_group=10**6) == w_src


def test_reshard_refuses_unrelated_nonempty_target(tmp_path):
    """The crashed-attempt sweep is keyed on the _RESHARDING marker: a
    non-empty target directory WITHOUT it is someone else's data and
    must be refused, never rm -rf'd (review finding on the round-4
    completion-marker change)."""
    spec = WalSpec(seed=61, num_conversations=20, num_epochs=1, events_per_epoch=200)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    tgt = os.path.join(str(tmp_path), "precious")
    os.makedirs(tgt)
    keep = os.path.join(tgt, "do-not-delete.txt")
    with open(keep, "w") as f:
        f.write("user data\n")
    with pytest.raises(ValueError, match="non-empty"):
        eng.reshard(tgt, 2)
    assert os.path.exists(keep)  # untouched


def test_apply_retry_discards_stale_staging(tmp_path):
    """A retry of a crashed apply() must recompute everything it reads:
    stale unit fragments / slice indexes staged by the failed attempt
    (possibly over a since-rewritten WAL segment) may not leak into the
    merge (review finding on the driver-off slice index change)."""
    spec = WalSpec(seed=62, num_conversations=30, num_epochs=2, events_per_epoch=300)
    gen, wal, eng = _build(str(tmp_path), spec)
    # plant poison staging for the group id apply() will use (max epoch)
    staging = os.path.join(eng.cfg.path, "_staging", "group-000001")
    os.makedirs(staging)
    poison = os.path.join(staging, "unit-99-deadbeef.parquet")
    with open(poison, "w") as f:
        f.write("not parquet")
    with open(os.path.join(staging, "slices-p0001.json"), "w") as f:
        f.write('[["99-deadbeef", [0]]]')
    eng.apply(wal)
    assert not os.path.exists(poison)  # wiped before staging, not merged
    _assert_equal_state(eng, gen)


def test_all_deleted_lake_stays_oracle_equal(tmp_path):
    """Delete EVERY live key: the engine's empty snapshot and the
    oracle's empty replay must still compare equal (both sides must
    return the TYPED merged-state schema incl. lsn — a NULL-typed or
    TRANSCRIPT-only empty on either side is a spurious mismatch), and
    compaction of the empty lake must preserve that."""
    import pandas as pd
    import pyarrow.parquet as pq

    from nyc_taxi_data_pipeline_ray import schemas

    spec = WalSpec(seed=13, num_conversations=30, num_epochs=2, events_per_epoch=400)
    gen, wal, eng = _build(str(tmp_path), spec)
    eng.apply(wal)
    live = eng.snapshot_table().select(["conv_id", "turn_idx"]).to_pandas()
    n = len(live)
    ev = pa.table(
        {
            "lsn": pa.array(range(10_000_000, 10_000_000 + n), pa.int64()),
            "op": pa.array(["delete"] * n),
            "epoch": pa.array([spec.num_epochs] * n, pa.int32()),
            "conv_id": pa.array(live["conv_id"], pa.string()),
            "turn_idx": pa.array(live["turn_idx"], pa.int32()),
            "role": pa.array([None] * n, pa.string()),
            "text": pa.array([None] * n, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([pd.Timestamp("2032-01-01").to_datetime64()] * n),
        }
    ).cast(schemas.EVENT_SCHEMA)
    d = os.path.join(wal, f"epoch={spec.num_epochs:06d}")
    os.makedirs(d)
    pq.write_table(ev, os.path.join(d, "part-0000.parquet"))
    eng.apply(wal)
    exp = oracle.replay(pa.concat_tables([gen.events_table(), ev]))
    assert exp.num_rows == 0 and exp.schema.field("lsn").type == pa.int64()
    cols = sorted(exp.schema.names)
    snap = eng.snapshot_table()
    assert snap.num_rows == 0
    assert snap.select(cols).equals(exp.select(cols))
    eng.compact()
    assert eng.snapshot_table().select(cols).equals(exp.select(cols))
