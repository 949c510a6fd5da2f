"""Driver-prefix safety: the correctness driver checks a PREFIX of the
registered inventory (50 names in rounds 1-2, possibly more later). This
pins, for the first 92 priority names (the full explicit priority list), the properties a driver row needs:
registered, oracle-bearing (or an explicitly documented rows-only
exception), and — via analysis only, no execution — an output schema of
atomic columns the driver's pandas canonicalizer can sort and hash.
Execution-level value checks live in test_oracle_queries; this tier test
is the cheap early alarm that the next driver window is already safe."""

from __future__ import annotations

import pytest

from event_data_etl_gcs_spark.queries import all_queries

TIER_N = 128

# Rows-only by documented design (non-SQL-expressible): the driver records
# a weaker rows-only check for these, which tolerates non-atomic columns.
# (multimodal_decode graduated to an exact oracle in round 5;
# graph_pagerank graduated in round 10 — scaled-integer arithmetic with
# an unrolled-CTE oracle. The set is now EMPTY: every registered query
# carries an exact oracle.)
ROWS_ONLY_OK: set[str] = set()


def tier():
    return list(all_queries().items())[:TIER_N]


def test_tier_spans_the_priority_list():
    items = tier()
    assert len(items) == TIER_N
    names = [n for n, _ in items]
    assert len(set(names)) == TIER_N


@pytest.mark.parametrize("name,spec", tier(), ids=[n for n, _ in tier()])
def test_tier_driver_safe(spark, name, spec):
    if spec.oracle is None:
        assert name in ROWS_ONLY_OK, (
            f"{name} is in the driver prefix without an oracle and without a "
            "documented rows-only exception"
        )
        return
    df = spec.fn(spark, "/root/testdata/sf0.001")
    bad = [
        (f.name, f.dataType.typeName())
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not bad, f"{name}: non-atomic driver-visible columns {bad}"
