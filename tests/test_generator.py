"""WAL generator: determinism + knob behavior (no Ray needed)."""

import numpy as np
import pyarrow.compute as pc

from nyc_taxi_data_pipeline_ray.sources.generator import WalGenerator, WalSpec
from nyc_taxi_data_pipeline_ray.stages import validate


def test_deterministic():
    spec = WalSpec(seed=11, num_conversations=40, num_epochs=2, events_per_epoch=300)
    a = WalGenerator(spec).events_table()
    b = WalGenerator(spec).events_table()
    assert a.equals(b)


def test_ops_mix_and_envelope():
    spec = WalSpec(seed=11, num_conversations=40, num_epochs=2, events_per_epoch=2000)
    t = WalGenerator(spec).events_table()
    ops = set(pc.unique(t["op"]).to_pylist())
    assert ops == {"insert", "update", "delete"}
    assert t.schema.field("lsn").type == "int64"
    # deletes carry only key + ts
    dels = t.filter(pc.equal(t["op"], "delete"))
    assert dels["text"].null_count == dels.num_rows
    assert dels["conv_id"].null_count == 0


def test_duplicates_knob():
    spec = WalSpec(seed=5, num_conversations=20, num_epochs=1, events_per_epoch=1000, dup_fraction=0.1)
    t = WalGenerator(spec).events_table()
    assert t.num_rows == 1100
    assert len(pc.unique(t["lsn"])) == 1000


def test_out_of_order_knob():
    spec = WalSpec(seed=5, num_conversations=20, num_epochs=1, events_per_epoch=1000, ooo_fraction=0.3)
    t = WalGenerator(spec).events_table()
    idx = pc.sort_indices(t, sort_keys=[("lsn", "ascending")])
    ts = t.take(idx)["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    frac_desc = (np.diff(ts.astype(np.int64)) < 0).mean()
    assert 0.1 < frac_desc < 0.5


def test_invalid_knob_matches_validator():
    spec = WalSpec(seed=5, num_conversations=20, num_epochs=1, events_per_epoch=1000, invalid_fraction=0.1)
    t = WalGenerator(spec).events_table()
    good, bad = validate.split_valid(t)
    assert 30 < bad.num_rows < 200
    assert good.num_rows + bad.num_rows == t.num_rows


def test_zipf_skew():
    spec = WalSpec(seed=5, num_conversations=100, num_epochs=1, events_per_epoch=5000, zipf_s=1.5)
    t = WalGenerator(spec).events_table()
    counts = pc.value_counts(t["conv_id"]).to_pylist()
    top = max(c["counts"] for c in counts)
    assert top > 5000 * 0.1  # hottest conversation takes >10% of events


def test_schema_evolution_knob():
    spec = WalSpec(seed=5, num_conversations=20, num_epochs=4, events_per_epoch=200, evolve_at_epoch=2)
    gen = WalGenerator(spec)
    t1 = gen._epoch_table(1)
    t2 = gen._epoch_table(2)
    assert "model" not in t1.schema.names and "model" in t2.schema.names
    assert str(t1.schema.field("turn_idx").type) == "int32"
    assert str(t2.schema.field("turn_idx").type) == "int64"
