"""Skew regression for the _RankPlan hot-bin sub-splitter (VERDICT r3 #3)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nyc_taxi_data_pipeline_ray.pipelines.relational import _RankPlan


def _mk_ds(values: np.ndarray, ids: np.ndarray) -> rd.Dataset:
    t = pa.table({"value": pa.array(values, pa.float64()), "event_id": pa.array(ids, pa.int64())})
    return rd.from_arrow(t).repartition(8)


def _exact_ranks(values, ids):
    order = np.lexsort((ids, values))
    r = np.empty(len(order), np.int64)
    r[order] = np.arange(1, len(order) + 1)
    return r


def _run(values, ids, cap, n_bins=64):
    ds = _mk_ds(values, ids)
    plan = _RankPlan(
        ds,
        lambda t: t["value"].to_numpy(zero_copy_only=False),
        lambda t: t["event_id"].to_numpy(zero_copy_only=False),
        lo=float(values.min()), hi=float(values.max()), n_bins=n_bins, cap=cap,
    )
    task = plan.assign(values, ids)
    # exactness: offsets + within-task sort reproduce the global order
    got = np.empty(len(values), np.int64)
    for tsk in np.unique(task):
        m = task == tsk
        sub = np.lexsort((ids[m], values[m]))
        rr = np.empty(m.sum(), np.int64)
        rr[sub] = int(plan.offsets[tsk]) + np.arange(1, m.sum() + 1)
        got[m] = rr
    assert (got == _exact_ranks(values, ids)).all()
    return plan, task


def test_rankplan_constant_dominated_column_splits():
    """90%-constant column: no single task may receive the whole column."""
    rng = np.random.default_rng(7)
    n = 50_000
    values = np.where(rng.random(n) < 0.9, 42.0, rng.uniform(0, 100, n))
    ids = rng.permutation(n).astype(np.int64)
    cap = 2000
    plan, task = _run(values, ids, cap)
    sizes = np.bincount(task)
    assert sizes.max() <= 2 * cap  # esub chunking bounds every task
    assert (task[values == 42.0] != task[values != 42.0][0]).any()
    assert len(np.unique(task[values == 42.0])) >= 10  # the hot value is sharded
    assert not plan.unsplit_hot


def test_rankplan_skewed_spread_column_splits():
    """Zipf-ish spread skew: value refinement splits the hot bins."""
    rng = np.random.default_rng(11)
    n = 30_000
    values = rng.zipf(1.3, n).clip(1, 10_000).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    cap = 2000
    plan, task = _run(values, ids, cap)
    sizes = np.bincount(task)
    # every single-valued run is chunked; multi-valued residue is recorded
    hot_ok = sizes.max() <= 2 * cap or plan.unsplit_hot
    assert hot_ok


def test_rankplan_id_concentrated_single_value_is_observable():
    """An id-CONCENTRATED single-value run (ids packed into a sliver of
    the bin's [imin, imax], stretched by two outliers) defeats uniform
    esub chunking — the finest deterministic unit overflows cap.  Ranks
    must stay exact and the overflow must be RECORDED in unsplit_hot
    (not silent), mirroring the vmin<vmax residue path."""
    rng = np.random.default_rng(13)
    n = 50_000
    values = np.full(n, 42.0)
    # hot ids packed into [5e5, 5.5e5]; outliers stretch the id range
    ids = rng.choice(np.arange(500_000, 550_000), n - 2, replace=False).astype(
        np.int64
    )
    ids = np.concatenate([ids, [0, 10**12]])
    values = np.concatenate([values[:-2], [42.0, 42.0]])
    cap = 2000
    plan, task = _run(values, ids, cap)
    sizes = np.bincount(task)
    assert sizes.max() > cap  # the collapse is real...
    assert plan.unsplit_hot  # ...and observable, not silent
    assert max(nn for _, _, nn in plan.unsplit_hot) == sizes.max()


def test_rankplan_uniform_fast_path_unchanged():
    """No hot bins -> no refinement pass, one task per occupied bin."""
    rng = np.random.default_rng(3)
    n = 20_000
    values = rng.uniform(0, 1, n)
    ids = np.arange(n, dtype=np.int64)
    plan, task = _run(values, ids, cap=1 << 18)
    assert not plan.hot.any()
    assert plan.e2d.shape[0] == 0
