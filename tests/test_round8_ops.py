"""Behavioral pins for the round-8 additions.

e23's distinguishing property is CROSS-BATCH state carry: the
exhaust_ord column records which micro-batch's arrivals crossed the
per-user admission cap, which only comes out right if the admitted
count survives between applyInPandasWithState invocations. The pins
check the quota algebra against an independently-computed batch
split, plus full oracle parity.
"""

import pytest

SF = "/root/testdata/sf0.001"


def _batch_split(sf_dir):
    """Independent recomputation of the staged event_id-third split."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id"]).to_pydict()
    m = max(t["event_id"]) + 1
    cut1, cut2 = m // 3, 2 * m // 3
    per = {}
    for eid, uid in zip(t["event_id"], t["user_id"]):
        b = 1 if eid < cut1 else (2 if eid < cut2 else 3)
        per.setdefault(uid, {}).setdefault(b, 0)
        per[uid][b] += 1
    return per


@pytest.mark.slow
def test_e23_quota_algebra_and_state_carry(spark):
    from postgres_scanner_spark.streaming.events import (
        _E23_QUOTA, e23_stateful_quota_admission,
    )
    per = _batch_split(SF)
    got = {r.user_id: r for r in
           e23_stateful_quota_admission(spark, SF).collect()}
    assert set(got) == set(per)
    for uid, batches in per.items():
        r = got[uid]
        seen = sum(batches.values())
        assert r.n_batches == len(batches)
        assert r.n_seen == seen
        assert r.n_admitted == min(_E23_QUOTA, seen)
        assert r.n_rejected == seen - min(_E23_QUOTA, seen)
        # exhaust_ord: ordinal (per-user appearance index) of the
        # batch whose CUMULATIVE count crossed the cap — cross-batch
        # state, recomputed independently here
        cum, exhaust = 0, 0
        for ordi, b in enumerate(sorted(batches), start=1):
            cum += batches[b]
            if cum >= _E23_QUOTA:
                exhaust = ordi
                break
        assert r.exhaust_ord == exhaust, uid
    # the pin is only meaningful if SOME user exhausts in a LATER
    # batch — that is the cross-batch state-carry the op exists for;
    # a data regen that removes this case must fail the test, not
    # silently weaken it
    ords = {r.exhaust_ord for r in got.values()}
    assert any(o > 1 for o in ords), sorted(ords)


@pytest.mark.slow
def test_x15_batch_plan_algebra(spark):
    """Per bucket: batches fill to exactly _X15_BATCH docs
    (n_batches == ceil(n_docs / B)), padding can only help
    (bucketed padded <= unbucketed padded), efficiency == real /
    padded, and every doc lands in exactly one bucket."""
    import math
    import pyarrow.parquet as pq
    from postgres_scanner_spark.functions.analytics import (
        _X15_BATCH, x15_length_bucketed_batches,
    )
    rows = x15_length_bucketed_batches(spark, SF).collect()
    n_corpus = pq.ParquetFile(f"{SF}/documents.parquet") \
        .metadata.num_rows
    assert sum(r.n_docs for r in rows) == n_corpus
    for r in rows:
        assert r.n_batches == math.ceil(r.n_docs / _X15_BATCH)
        assert r.real_tokens <= r.padded_tokens <= r.unbucketed_padded
        assert abs(r.efficiency
                   - round(r.real_tokens / r.padded_tokens, 4)) < 1e-9


@pytest.mark.slow
def test_x16_reweight_properties(spark):
    """Weights are a distribution (sum 1), strictly monotone in the
    loss proxy (harder domains upweighted), and uniform iff losses
    are equal — the multiplicative-weights contract."""
    from postgres_scanner_spark.functions.analytics import (
        x16_domain_reweight,
    )
    rows = x16_domain_reweight(spark, SF).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    by_loss = sorted(rows, key=lambda r: r.loss)
    for a, b in zip(by_loss, by_loss[1:]):
        assert a.weight <= b.weight
        if b.loss - a.loss > 1e-6:
            assert b.weight > a.weight


@pytest.mark.slow
def test_e23_oracle_parity(spark):
    from postgres_scanner_spark.streaming.events import (
        _E23_SQL, e23_stateful_quota_admission,
    )
    from tests.oracle_harness import compare
    ok, problems = compare(
        "e23", e23_stateful_quota_admission(spark, SF), _E23_SQL, SF)
    assert ok, problems
