"""Round-13 pins: the cogrouped Arrow tile kernel that replaced the
per-pair interpreted HOF `_dot` fold in d5/d14 must be BIT-IDENTICAL
to the scalar left-to-right fold pipeline it replaced (the oracle
contract), on every path: GEMM fast path, boundary-guard exact
replay, same-block masking, and lhs chunking. Pure-Python (no Spark
session): the kernel is a plain (pa.Table, pa.Table) -> pa.Table
function, so the pin exercises exactly the code the executor runs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import postgres_scanner_spark.operators.dedup as dd

DIM = 64


def _fold(x, y):
    acc = 0.0
    for k in range(DIM):
        acc = acc + float(x[k]) * float(y[k])
    return acc


def _mk(nl, nr, seed, near=0):
    rng = np.random.default_rng(seed)
    el = rng.standard_normal((nl, DIM)).astype(np.float32)
    er = rng.standard_normal((nr, DIM)).astype(np.float32)
    if near:
        er[:near] = el[:near] + \
            rng.standard_normal((near, DIM)).astype(np.float32) * 0.01
    nml = np.array([math.sqrt(_fold(r, r)) for r in el])
    nmr = np.array([math.sqrt(_fold(r, r)) for r in er])
    idl = np.arange(nl, dtype=np.int64)
    idr = np.arange(nr, dtype=np.int64) + 50_000
    left = pa.table({
        "pair_id": pa.array(np.zeros(nl, np.int32)),
        "bi": pa.array(np.zeros(nl, np.int32)),
        "bj": pa.array(np.ones(nl, np.int32)),
        "vec_id": pa.array(idl),
        "embedding": pa.array([list(map(float, r)) for r in el],
                              pa.list_(pa.float32())),
        "norm": pa.array(nml)})
    right = pa.table({
        "pid2": pa.array(np.zeros(nr, np.int32)),
        "vec_id2": pa.array(idr),
        "embedding2": pa.array([list(map(float, r)) for r in er],
                               pa.list_(pa.float32())),
        "norm2": pa.array(nmr)})
    return el, er, nml, nmr, idl, idr, left, right


def _reference(el, er, nml, nmr, idl, idr, tau):
    ref = {}
    for i in range(el.shape[0]):
        for j in range(er.shape[0]):
            c = _fold(el[i], er[j]) / (nml[i] * nmr[j])
            r = math.floor(c * 100000.0 + 0.5) / 100000.0
            if r > tau:
                a, b = min(idl[i], idr[j]), max(idl[i], idr[j])
                ref[(a, b)] = r
    return ref


def _as_dict(out):
    return {(out["vec_a"][i].as_py(), out["vec_b"][i].as_py()):
            out["cos_sim"][i].as_py() for i in range(out.num_rows)}


def test_kernel_bit_identical_to_scalar_fold():
    el, er, nml, nmr, idl, idr, left, right = _mk(250, 300, 3, near=120)
    ref = _reference(el, er, nml, nmr, idl, idr, 0.45)
    fn = dd._cos_tile_fn("embedding", "embedding2", 0.45, DIM,
                         "vec_a", "vec_b")
    got = _as_dict(fn(left, right))
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert repr(got[k]) == repr(v), (k, got[k], v)


def test_gemm_fast_path_equals_forced_exact_path():
    _, _, _, _, _, _, left, right = _mk(200, 220, 11, near=90)
    fn = dd._cos_tile_fn("embedding", "embedding2", 0.45, DIM,
                         "vec_a", "vec_b")
    fast = _as_dict(fn(left, right))
    band = dd._TILE_GUARD_BAND
    try:
        dd._TILE_GUARD_BAND = 1e9   # flag EVERY pair -> exact replay
        exact = _as_dict(
            dd._cos_tile_fn("embedding", "embedding2", 0.45, DIM,
                            "vec_a", "vec_b")(left, right))
    finally:
        dd._TILE_GUARD_BAND = band
    assert {k: repr(v) for k, v in fast.items()} \
        == {k: repr(v) for k, v in exact.items()}
    assert fast, "expected non-empty near-dup set"


def test_same_block_mask_and_chunking():
    el, er, nml, nmr, idl, idr, left, right = _mk(180, 180, 7, near=80)
    # same-block: bi == bj -> only idl < idr pairs (always true here
    # since idr starts at 50k, so output must equal the cross-block
    # run; ALSO verify a genuinely overlapping id space drops pairs)
    left_same = left.set_column(2, "bj", pa.array(np.zeros(180, np.int32)))
    fn = dd._cos_tile_fn("embedding", "embedding2", 0.45, DIM,
                         "vec_a", "vec_b")
    assert _as_dict(fn(left_same, right)) == _as_dict(fn(left, right))
    right_overlap = right.set_column(
        1, "vec_id2", pa.array(np.arange(180, dtype=np.int64)))
    out = fn(left_same, right_overlap)
    va = out["vec_a"].to_numpy(zero_copy_only=False)
    vb = out["vec_b"].to_numpy(zero_copy_only=False)
    assert (va < vb).all()          # diagonal/self pairs masked out
    # chunking must not change a single byte
    chunk = dd._TILE_CHUNK_ELEMS
    try:
        dd._TILE_CHUNK_ELEMS = 1_000    # ~6-row chunks
        chunked = _as_dict(
            dd._cos_tile_fn("embedding", "embedding2", 0.45, DIM,
                            "vec_a", "vec_b")(left, right))
    finally:
        dd._TILE_CHUNK_ELEMS = chunk
    assert {k: repr(v) for k, v in chunked.items()} \
        == {k: repr(v) for k, v in _as_dict(fn(left, right)).items()}


def test_cluster_column_and_empty_sides():
    _, _, _, _, _, _, left, right = _mk(60, 70, 5, near=30)
    left = left.rename_columns(
        ["tile_id", "bi", "bj", "vec_id", "x", "norm"])
    left = left.append_column(
        "cluster", pa.array(np.full(60, 3, np.int32)))
    right = right.rename_columns(["tid2", "vec_id2", "x2", "norm2"])
    fn = dd._cos_tile_fn("x", "x2", 0.45, DIM, "u", "v",
                         cluster_col="cluster")
    out = fn(left, right)
    assert out.schema.names == ["u", "v", "cluster", "cos_sim"]
    assert out.num_rows > 0
    assert set(out["cluster"].to_pylist()) == {3}
    empty = left.slice(0, 0)
    assert fn(empty, right).num_rows == 0
    assert fn(left, right.slice(0, 0)).num_rows == 0


def test_nonfinite_cosine_fails_loudly():
    _, _, _, _, _, _, left, right = _mk(20, 20, 9)
    # an all-zero vector -> norm 0 -> 0/0 cosine: must raise, never
    # silently apply NumPy's NaN-comparison semantics
    zero_emb = pa.array([[0.0] * DIM] + left["embedding"].to_pylist()[1:],
                        pa.list_(pa.float32()))
    left = left.set_column(4, "embedding", zero_emb)
    fn = dd._cos_tile_fn("embedding", "embedding2", 0.45, DIM,
                         "vec_a", "vec_b")
    with pytest.raises(ValueError, match="non-finite"):
        fn(left, right)
