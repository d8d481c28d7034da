"""From-scratch sketch tests — operators/sketches.py, gated against
independent plain-Python implementations of the same public formulas."""

from __future__ import annotations

import hashlib
import math

from dedup_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    HLL_ALPHA,
    HLL_M,
    HLL_P,
    HLL_SC,
    cms_point_estimates,
    cms_table,
    hll_estimate,
    hll_registers,
)


def _py_hll(keys):
    regs = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        idx, w = h % HLL_M, h >> HLL_P
        rho = HLL_SC if w == 0 else HLL_SC - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s = sum(1 << (HLL_SC - r) for r in regs.values())
    zeros = HLL_M - len(regs)
    s_full = s + zeros * (1 << HLL_SC)
    e_raw = (HLL_ALPHA * HLL_M * HLL_M) * float(1 << HLL_SC) / float(s_full)
    if e_raw <= 2.5 * HLL_M and zeros > 0:
        return round(float(HLL_M) * math.log(float(HLL_M) / zeros), 6), zeros
    return round(e_raw, 6), zeros


def _py_cms(stream):
    cells: dict[tuple[int, int], int] = {}
    for k in stream:
        hx = hashlib.md5(k.encode()).hexdigest()
        for d in range(CMS_D):
            b = int(hx[8 * d : 8 * d + 8], 16) % CMS_W
            cells[(d, b)] = cells.get((d, b), 0) + 1
    def point(k):
        hx = hashlib.md5(k.encode()).hexdigest()
        return min(
            cells.get((d, int(hx[8 * d : 8 * d + 8], 16) % CMS_W), 0)
            for d in range(CMS_D)
        )
    return point


def test_hll_matches_python_reference(spark):
    keys = [f"key-{i}" for i in range(3000)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    row = hll_estimate(hll_registers(df)).collect()[0]
    want_est, want_zeros = _py_hll(keys)
    assert row["hll_estimate"] == want_est
    assert row["n_zero_registers"] == want_zeros
    # m=256 standard error is 1.04/16 = 6.5%; allow 4 sigma
    assert abs(row["hll_estimate"] - 3000) / 3000 < 0.26


def test_hll_small_range_correction_engages(spark):
    keys = [f"k{i}" for i in range(5)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    row = hll_estimate(hll_registers(df)).collect()[0]
    want_est, _ = _py_hll(keys)
    assert row["small_range"] is True
    assert row["hll_estimate"] == want_est


def test_hll_registers_merge_by_max(spark):
    a = [f"a{i}" for i in range(200)]
    b = [f"b{i}" for i in range(200)]
    df = lambda ks: spark.createDataFrame([(k,) for k in ks], ["key"])
    ra = {r["idx"]: r["rho"] for r in hll_registers(df(a)).collect()}
    rb = {r["idx"]: r["rho"] for r in hll_registers(df(b)).collect()}
    rab = {r["idx"]: r["rho"] for r in hll_registers(df(a + b)).collect()}
    merged = {i: max(ra.get(i, 0), rb.get(i, 0)) for i in set(ra) | set(rb)}
    assert rab == merged


def test_cms_collisions_overestimate_one_sided(spark):
    # 4000 distinct keys in 512 buckets: every row collides, some keys
    # must overestimate; NONE may underestimate
    stream = [f"t{i % 4000}" for i in range(8000)]
    df = spark.createDataFrame([(k,) for k in stream], ["key"])
    exact = {}
    for k in stream:
        exact[k] = exact.get(k, 0) + 1
    q = spark.createDataFrame([(k,) for k in exact], ["key"])
    got = {
        r["key"]: r["cms_estimate"]
        for r in cms_point_estimates(cms_table(df), q).collect()
    }
    point = _py_cms(stream)
    assert got == {k: point(k) for k in exact}
    assert all(got[k] >= c for k, c in exact.items())
    assert any(got[k] > c for k, c in exact.items())


def test_cms_weighted(spark):
    rows = [("a", 5), ("b", 7), ("a", 3)]
    df = spark.createDataFrame(rows, ["key", "w"])
    q = spark.createDataFrame([("a",), ("b",)], ["key"])
    got = {
        r["key"]: r["cms_estimate"]
        for r in cms_point_estimates(
            cms_table(df, weight_col="w"), q
        ).collect()
    }
    # 2 keys in 512 buckets: no collisions, estimates exact
    assert got == {"a": 8, "b": 7}
