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
    eng.apply(wal)
    snap = eng.snapshot_table()
    exp = oracle.replay(gen.events_table())
    cols = sorted(exp.schema.names)
    assert snap.num_rows == exp.num_rows
    assert snap.select(cols).equals(exp.select(cols))
