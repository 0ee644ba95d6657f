"""Property-based engine check: for ANY small WAL shape (seed, op mix,
out-of-order fraction, duplicates, skew), full replay must equal the
single-process dict-oracle state.  Few examples, deadline off — each
example is a real Ray pipeline; the value is the randomized op-mix
coverage, not volume."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nyc_taxi_data_pipeline_ray import CdcEngine, LakeConfig
from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec
from nyc_taxi_data_pipeline_ray.state import oracle


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    p_update=st.floats(min_value=0.0, max_value=0.6),
    p_delete=st.floats(min_value=0.0, max_value=0.3),
    ooo=st.floats(min_value=0.0, max_value=0.4),
    dup=st.floats(min_value=0.0, max_value=0.2),
    zipf=st.sampled_from([0.0, 1.5]),
)
def test_replay_equals_oracle_any_shape(tmp_path_factory, seed, p_update, p_delete, ooo, dup, zipf):
    tmp = str(tmp_path_factory.mktemp(f"prop{seed % 100000}"))
    spec = WalSpec(
        seed=seed,
        num_conversations=40,
        num_epochs=2,
        events_per_epoch=400,
        p_update=p_update,
        p_delete=p_delete,
        ooo_fraction=ooo,
        dup_fraction=dup,
        zipf_s=zipf,
    )
    gen = WalGenerator(spec)
    wal = os.path.join(tmp, "wal")
    gen.write(wal)
    eng = CdcEngine(LakeConfig.open_or_create(os.path.join(tmp, "lake"), num_partitions=4))
    eng.apply(wal, max_epochs=1)
    # reshard mid-stream to a coprime partition count: the rest of the
    # WAL (ooo/dup/skew included) must converge under the new layout
    eng2 = eng.reshard(os.path.join(tmp, "lake5"), 5)
    eng.apply(wal)
    eng2.apply(wal)
    assert eng2.checksum() == eng.checksum()
    snap = eng.snapshot_table()
    exp = oracle.replay(gen.events_table())
    cols = sorted(exp.schema.names)
    assert snap.num_rows == exp.num_rows
    assert snap.select(cols).equals(exp.select(cols))
    assert eng2.snapshot_table().select(cols).equals(exp.select(cols))


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    p_update=st.floats(min_value=0.0, max_value=0.5),
    p_delete=st.floats(min_value=0.0, max_value=0.3),
    cutoff_q=st.floats(min_value=0.1, max_value=0.9),
)
def test_purge_then_backfill_any_shape(tmp_path_factory, seed, p_update, p_delete, cutoff_q):
    """For ANY WAL shape and ANY retention-cutoff quantile: purge must
    leave exactly the oracle winners at/after the cutoff, and a
    follow-up backfill (redact every user turn) must equal the same
    rewrite applied to that oracle state — the derived-epoch path is
    correct under arbitrary op mixes, not just the hand-picked tests."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    tmp = str(tmp_path_factory.mktemp(f"pb{seed % 100000}"))
    spec = WalSpec(
        seed=seed,
        num_conversations=40,
        num_epochs=2,
        events_per_epoch=400,
        p_update=p_update,
        p_delete=p_delete,
    )
    gen = WalGenerator(spec)
    wal = os.path.join(tmp, "wal")
    gen.write(wal)
    eng = CdcEngine(LakeConfig.open_or_create(os.path.join(tmp, "lake"), num_partitions=4))
    eng.apply(wal)
    exp = oracle.replay(gen.events_table())

    ts_series = pd.Series(exp["ts"].to_pandas())
    cutoff = ts_series.quantile(cutoff_q)
    epoch, rep = eng.purge(wal, older_than=cutoff)
    assert rep.rejects == 0
    exp2 = exp.filter(pc.greater_equal(exp["ts"], pa.scalar(cutoff.to_datetime64())))
    snap = eng.snapshot_table()
    cols = sorted(exp2.schema.names)
    assert snap.num_rows == exp2.num_rows
    assert snap.select(cols).equals(exp2.select(cols))

    if exp2.num_rows == 0:
        return
    stamp = pd.Timestamp(ts_series.max()) + pd.Timedelta(seconds=1)

    def redact(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t["role"], "user"))
        return sel.set_column(
            sel.schema.get_field_index("text"),
            "text",
            pa.array(["REDACTED"] * sel.num_rows),
        )

    epoch2, rep2 = eng.backfill(wal, redact, ts=stamp)
    assert rep2.rejects == 0
    got = eng.snapshot_table().to_pandas()
    want = exp2.to_pandas()
    m = want["role"] == "user"
    want.loc[m, "text"] = "REDACTED"
    want.loc[m, "ts"] = stamp
    if "lsn" in want.columns:
        want.loc[m, "lsn"] = 1 << 60
    shared = sorted(set(got.columns) & set(want.columns))
    got = got[shared].sort_values(["conv_id", "turn_idx"], ignore_index=True)
    want = want[shared].sort_values(["conv_id", "turn_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want)
