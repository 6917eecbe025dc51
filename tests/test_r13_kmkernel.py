"""Round-13 pins: the Arrow kernels that replaced the interpreted
HOF folds in km_trained_assignment (a6/d14/d27) and d27's
candidate-pair verification must be BIT-IDENTICAL to the scalar
left-to-right folds they replaced (the oracle contract). Pure
Python (no Spark session): both kernels are plain Arrow-table
functions, so the pins exercise exactly the code the executor runs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import postgres_scanner_spark.operators.ann as ann
import postgres_scanner_spark.operators.dedup as dd

DIM = 64


def _d2_fold(x, c):
    acc = 0.0
    for k in range(DIM):
        t = float(x[k]) - float(c[k])
        acc = acc + t * t
    return acc


def _dot_fold(x, y):
    acc = 0.0
    for k in range(DIM):
        acc = acc + float(x[k]) * float(y[k])
    return acc


def _lists(m):
    return pa.array([list(map(float, r)) for r in m],
                    pa.list_(pa.float64()))


def _mk_km(n, k, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, DIM))
    c = rng.standard_normal((k, DIM))
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    left = pa.table({
        "vec_id": pa.array(ids),
        "x": _lists(x),
        "blk": pa.array(np.zeros(n, np.int64))})
    right = pa.table({
        "cent_id": pa.array(np.arange(k, dtype=np.int32)),
        "c": _lists(c),
        "blk": pa.array(np.zeros(k, np.int64))})
    return x, c, ids, left, right


def _km_reference(x, c, ids):
    out = {}
    for i in range(x.shape[0]):
        best = None
        for j in range(c.shape[0]):     # ascending cent_id
            d = _d2_fold(x[i], c[j])
            if best is None or d < best[1]:
                best = (j, d)
        out[ids[i]] = best
    return out


def test_km_kernel_bit_identical_to_scalar_fold():
    x, c, ids, left, right = _mk_km(300, 4, 17)
    got = ann._km_assign_fn()(left, right)
    assert got.num_rows == 300
    ref = _km_reference(x, c, ids)
    for i in range(got.num_rows):
        vid = got["vec_id"][i].as_py()
        cl, d2 = ref[vid]
        assert got["cluster"][i].as_py() == cl
        assert repr(got["dist2"][i].as_py()) == repr(d2), vid
        # x passthrough must be bit-exact
        assert got["x"][i].as_py() == list(x[ids.tolist().index(vid)])


def test_km_kernel_tie_breaks_to_lower_cent_id():
    x, c, ids, left, right = _mk_km(50, 4, 23)
    # duplicate centroid 1's coordinates into centroid 3: every
    # vector's dist2 to 1 and 3 is the same double, so the window's
    # (dist2, cent_id) order must never pick 3
    c2 = c.copy()
    c2[3] = c2[1]
    right = right.set_column(1, "c", _lists(c2))
    got = ann._km_assign_fn()(left, right)
    assert 3 not in set(got["cluster"].to_pylist())
    # and centroid order in the input table must not matter
    perm = [2, 0, 3, 1]
    right_shuf = pa.table({
        "cent_id": pa.array(np.array(perm, np.int32)),
        "c": _lists(c2[perm]),
        "blk": pa.array(np.zeros(4, np.int64))})
    got2 = ann._km_assign_fn()(left, right_shuf)
    assert got["cluster"].to_pylist() == got2["cluster"].to_pylist()
    assert got["dist2"].to_pylist() == got2["dist2"].to_pylist()


def test_km_kernel_empty_and_missing_centroids():
    _, _, _, left, right = _mk_km(10, 4, 5)
    fn = ann._km_assign_fn()
    assert fn(left.slice(0, 0), right).num_rows == 0
    with pytest.raises(ValueError, match="without centroids"):
        fn(left, right.slice(0, 0))


def _mk_pairs(n, seed, near=0):
    rng = np.random.default_rng(seed)
    xa = rng.standard_normal((n, DIM))
    xb = rng.standard_normal((n, DIM))
    if near:
        xb[:near] = xa[:near] + rng.standard_normal((near, DIM)) * 0.01
    na = np.array([math.sqrt(_dot_fold(r, r)) for r in xa])
    nb = np.array([math.sqrt(_dot_fold(r, r)) for r in xb])
    t = pa.table({
        "u": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.arange(n, dtype=np.int64) + 10_000),
        "cluster": pa.array(np.full(n, 2, np.int32)),
        "xa": _lists(xa), "na": pa.array(na),
        "xb": _lists(xb), "nb": pa.array(nb)})
    return xa, xb, na, nb, t


def test_pair_kernel_bit_identical_to_scalar_fold():
    tau = 0.45
    xa, xb, na, nb, t = _mk_pairs(400, 31, near=150)
    ref = {}
    for i in range(400):
        c = _dot_fold(xa[i], xb[i]) / (na[i] * nb[i])
        r = math.floor(c * 100000.0 + 0.5) / 100000.0
        if r > tau:
            ref[i] = r
    out = pa.Table.from_batches(
        list(dd._pair_cos_fn(tau)(t.to_batches(max_chunksize=97))))
    assert out.num_rows == len(ref) > 0
    got = {out["u"][i].as_py(): out["cos_sim"][i].as_py()
           for i in range(out.num_rows)}
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert repr(got[k]) == repr(v), k
    assert set(out["cluster"].to_pylist()) == {2}
    # v passthrough intact
    assert all(out["v"][i].as_py() == out["u"][i].as_py() + 10_000
               for i in range(out.num_rows))


def test_pair_kernel_nonfinite_and_empty():
    _, _, _, _, t = _mk_pairs(20, 9)
    na0 = t["na"].to_pylist()
    na0[0] = 0.0                       # 0/0 -> must raise
    t0 = t.set_column(4, "na", pa.array(na0))
    with pytest.raises(ValueError, match="non-finite"):
        list(dd._pair_cos_fn(0.45)(t0.to_batches()))
    assert list(dd._pair_cos_fn(2.0)(t.to_batches())) == []
    assert list(dd._pair_cos_fn(0.45)(t.slice(0, 0).to_batches())) == []
