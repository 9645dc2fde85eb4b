"""Property-based CDC invariants: merge_upsert is idempotent, preserves
unmatched rows, and its key set is the union of both inputs' keys."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_kafka_2_spark.operators.cdc import merge_upsert

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),   # key
        st.integers(min_value=0, max_value=99),   # value
        st.integers(min_value=0, max_value=9),    # version
    ),
    min_size=1,
    max_size=25,
)


@given(target=rows, updates=rows)
@settings(**_SETTINGS)
def test_merge_upsert_properties(spark, target, updates):
    # target must itself be key-unique (it's a snapshot)
    seen, tgt = set(), []
    for k, v, ver in target:
        if k not in seen:
            seen.add(k)
            tgt.append((k, v, ver))
    t = spark.createDataFrame(tgt, ["k", "v", "ver"])
    u = spark.createDataFrame(updates, ["k", "v", "ver"])

    merged = merge_upsert(t, u, ["k"], version_col="ver")
    out = {r.k: (r.v, r.ver) for r in merged.collect()}

    t_keys = {k for k, _, _ in tgt}
    u_keys = {k for k, _, _ in updates}
    # key set = union; exactly one row per key
    assert set(out) == t_keys | u_keys
    assert merged.count() == len(t_keys | u_keys)
    # unmatched target rows unchanged
    for k, v, ver in tgt:
        if k not in u_keys:
            assert out[k] == (v, ver)
    # updated keys carry the highest update version
    for k in u_keys:
        best_ver = max(ver for kk, _, ver in updates if kk == k)
        assert out[k][1] == best_ver

    # idempotence: re-applying the same updates changes nothing
    again = {
        r.k: (r.v, r.ver)
        for r in merge_upsert(merged, u, ["k"], version_col="ver").collect()
    }
    # values may differ only where duplicate (k, best_ver) pairs with
    # different payloads exist in the updates (tie on the version);
    # restrict the check to keys with a unique best-version payload
    for k in set(out):
        payloads = {
            (v,) for kk, v, ver in updates
            if kk == k and ver == max(vv for k2, _, vv in updates if k2 == k)
        } if k in u_keys else set()
        if len(payloads) <= 1:
            assert again[k] == out[k]
