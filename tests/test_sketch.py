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


def test_bloom_no_false_negatives_and_low_fpr():
    from nyc_taxi_data_pipeline_ray.pipelines.relational import _bloom_hashes

    m_bits, k = 1 << 17, 4
    members = np.arange(0, 4000, dtype=np.int64) * 7 + 3
    others = np.arange(100_000, 150_000, dtype=np.int64)
    bits = np.zeros(m_bits, np.bool_)
    h1, h2 = _bloom_hashes(members)
    for i in range(k):
        bits[(h1 + np.uint64(i) * h2) & np.uint64(m_bits - 1)] = True

    def test(keys):
        h1, h2 = _bloom_hashes(keys)
        mask = np.ones(len(keys), np.bool_)
        for i in range(k):
            mask &= bits[(h1 + np.uint64(i) * h2) & np.uint64(m_bits - 1)]
        return mask

    assert test(members).all()  # no false negatives, ever
    # 4k keys in 128k bits, k=4 -> theoretical FPR ~ (1-e^-kn/m)^k ~ 0.02%
    fpr = test(np.setdiff1d(others, members)).mean()
    assert fpr < 0.005, fpr


def test_quantile_digest_small_cap_error_bound():
    """At cap far below group size the digest is approximate; rank error
    must stay within the max-cell-weight bound (~n/cap of rank mass)."""
    from nyc_taxi_data_pipeline_ray.pipelines.relational import (
        _digest_compress,
        _digest_quantile,
    )

    rng = np.random.RandomState(7)
    x = np.sort(rng.lognormal(0, 1, 50_000))
    v, w = _digest_compress(x.copy(), np.ones(len(x)), 256)
    assert len(v) <= 256 and w.sum() == len(x)
    for q in (0.5, 0.9, 0.99):
        est = _digest_quantile(v, w, q)
        # rank of the estimate in the true data vs target rank
        rank = np.searchsorted(x, est) / len(x)
        assert abs(rank - q) < 2 * 1.0 / 256 * (len(x) / len(x)) + 0.01, (q, rank)


def test_quantile_digest_exact_when_under_cap():
    from nyc_taxi_data_pipeline_ray.pipelines.relational import (
        _digest_compress,
        _digest_quantile,
    )

    rng = np.random.RandomState(3)
    x = np.sort(rng.uniform(0, 100, 1000))
    v, w = _digest_compress(x.copy(), np.ones(len(x)), 8192)
    assert (v == x).all()
    for q in (0.0, 0.25, 0.5, 0.77, 0.9, 0.99, 1.0):
        assert abs(_digest_quantile(v, w, q) - np.quantile(x, q)) < 1e-9


def test_misra_gries_bound_and_exactness():
    from nyc_taxi_data_pipeline_ray.pipelines.relational import _bloom_hashes  # noqa: F401
    from nyc_taxi_data_pipeline_ray.pipelines.text import _mg_trim

    # exact regime: no trim when distinct <= cap
    t = np.array(["a", "b", "c"], object)
    c = np.array([5, 3, 1])
    tt, cc = _mg_trim(t, c, 10)
    assert list(tt) == ["a", "b", "c"] and list(cc) == [5, 3, 1]

    # trimming regime: Zipf counts, undercount bounded by N/cap
    rng = np.random.RandomState(11)
    vocab = np.array([f"w{i}" for i in range(5000)], object)
    true = (10_000 / np.arange(1, 5001) ** 1.2).astype(np.int64) + 1
    n_total = true.sum()
    cap = 64
    terms, counts = _mg_trim(vocab.copy(), true.copy(), cap)
    assert len(terms) <= cap
    kept = {t: c for t, c in zip(terms, counts)}
    for i in range(5):  # the true heavy head must survive with bounded undercount
        w = f"w{i}"
        assert w in kept
        assert 0 <= true[i] - kept[w] <= n_total / cap + 1
