"""HyperLogLog sketch: the oracle gate proves engine/SQL bit-equality;
this proves the ESTIMATE is close to the true cardinality (the sketch's
reason to exist) and that register partials merge as a monoid."""

import duckdb
import numpy as np

from nyc_taxi_data_pipeline_ray.pipelines.relational import (
    _bit_length_u64,
    q_hll_distinct,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_accuracy_vs_exact():
    est = q_hll_distinct(SF_DIR).set_index("o_year")["hll_distinct"]
    exact = (
        duckdb.connect()
        .execute(
            f"""select cast(year(o_orderdate) as bigint) as y,
                       count(distinct o_custkey) as n
                from '{SF_DIR}/orders.parquet' group by 1"""
        )
        .fetchdf()
        .set_index("y")["n"]
    )
    assert set(est.index) == set(exact.index)
    for y in exact.index:
        rel = abs(est[y] - exact[y]) / exact[y]
        # p=8 -> stderr ~1.04/16 = 6.5%; 3 sigma bound
        assert rel < 0.20, (y, est[y], exact[y], rel)


def test_bit_length_exact():
    w = np.array([0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 56) - 1, 1 << 63], np.uint64)
    got = _bit_length_u64(w)
    exp = np.array([int(x).bit_length() for x in w], np.int64)
    assert (got == exp).all()
