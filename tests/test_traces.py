"""Replay the reference's sqllogictest trace corpus: Spark SQL vs
DuckDB over the same evolving tables (VERDICT r3 "What's missing" #1).

Reference: /root/reference/script/testing/junit/traces/*.test, replayed
over JDBC by script/testing/junit/src/TracefileTest.java — hundreds of
statement/expected-row cases that catch expression-semantics corners
(nulls in aggregates, trig precision, nested-query shapes) no
hand-picked query set reaches.  See tests/trace_replay.py for the
replay model (DuckDB = state machine + oracle; Spark executes every
query over snapshotted views; results diffed as canonicalized
multisets) and the documented dialect skip list.

Gate per trace: ZERO failures, and a pinned minimum pass count so the
corpus can't silently shrink to skips."""

import os

import pytest

from trace_replay import TRACE_DIR, replay_trace

# (trace file, min queries that must PASS the cross-engine diff, min
# queries whose ORDER BY must be order-VERIFIED — see trace_replay
# _order_spec; 0 where the trace orders by expressions/unprojected keys,
# which fall back to the multiset diff).  Minimums are pinned slightly
# under the observed counts so a DuckDB/Spark upgrade that legitimately
# shifts a case or two doesn't hard-fail, while a parser regression
# (dozens of cases) does.
TRACES = [
    ("aggregations.test", 20, 0),      # 22 observed
    ("select.test", 135, 0),           # 144 observed; its ORDER BY queries
                                       # are SELECT * over joins — duplicate
                                       # output names make key binding
                                       # ambiguous, so they are conservatively
                                       # order-unchecked
    ("orderby.test", 12, 12),          # 13 / 13 observed
    ("nested-query.test", 19, 10),     # 21 / 12 observed
    ("functions.test", 110, 0),        # 122 observed
    ("functions_trig.test", 2, 2),     # 2 / 2 observed (1 documented skip)
    ("sqlite-select1.test", 130, 125), # 138 / 132 observed
    ("sqlite-select2.test", 125, 0),   # 134 observed (trace has no ORDER BY)
    ("sqlite-select3.test", 350, 160), # 370 / 168 observed
    ("insert.test", 24, 0),            # 26 observed
    ("update.test", 17, 0),            # 19 observed
    ("create_index.test", 4, 0),       # 4 observed
]


@pytest.mark.skipif(
    not os.path.isdir(TRACE_DIR), reason="reference trace corpus not present"
)
@pytest.mark.parametrize(
    "name,min_pass,min_ordered", TRACES, ids=[t for t, _, _ in TRACES]
)
def test_trace_replay(spark, name, min_pass, min_ordered):
    res = replay_trace(spark, os.path.join(TRACE_DIR, name))
    detail = "\n".join(
        f"  {' '.join(sql.split())[:100]} | {d[:120]}" for sql, d in res.failures
    )
    assert not res.failures, (
        f"{name}: {len(res.failures)} cross-engine mismatches of "
        f"{res.queries} queries\n{detail}"
    )
    assert res.passed >= min_pass, (
        f"{name}: only {res.passed} passed (expected >= {min_pass}); "
        f"skipped={len(res.skipped)} no_oracle={len(res.no_oracle)}"
    )
    assert res.order_checked >= min_ordered, (
        f"{name}: only {res.order_checked} ORDER BY sequences verified "
        f"(expected >= {min_ordered})"
    )


def test_order_spec_and_sortedness():
    """Unit twin for the ORDER BY verifier: key parsing (ordinals,
    DESC, qualified names, depth-0 only, expression fallback) and the
    sortedness check under both NULL conventions."""
    import pandas as pd

    from trace_replay import _is_ordered, _order_spec

    cols = ["a", "b"]
    assert _order_spec("SELECT a,b FROM t ORDER BY a DESC, 2", cols) == [
        (0, True, None),
        (1, False, None),
    ]
    assert _order_spec("SELECT a,b FROM t ORDER BY t.a LIMIT 3", cols) == [
        (0, False, None)
    ]
    assert _order_spec("SELECT a,b FROM t", cols) is None
    # subquery ORDER BY does not constrain the outer result
    assert _order_spec("SELECT a,b FROM (SELECT * FROM t ORDER BY a) x", cols) is None
    # expression keys can't be checked from the output columns
    assert _order_spec("SELECT a,b FROM t ORDER BY a+b", cols) is None
    # explicit NULLS hints are captured per key
    assert _order_spec("SELECT a,b FROM t ORDER BY a NULLS LAST, b DESC", cols) == [
        (0, False, "last"),
        (1, True, None),
    ]
    # duplicate output names make the binding ambiguous — unresolvable
    assert _order_spec("SELECT t.a, s.a FROM t, s ORDER BY s.a", ["a", "a"]) is None
    # quoted literals can't corrupt the paren/keyword scan: the ')' and
    # the 'order by' text below are inside strings
    assert _order_spec(
        "SELECT a, ') order by b' AS p FROM (SELECT a FROM t ORDER BY a) x",
        ["a", "p"],
    ) is None
    assert _order_spec(
        "SELECT a FROM t WHERE a <> '(' ORDER BY a", ["a"]
    ) == [(0, False, None)]
    df = pd.DataFrame({"a": [3, 2, 1], "b": [1, 2, 3]})
    assert _is_ordered(df, [(0, True, None)], True)
    assert not _is_ordered(df, [(0, False, None)], True)
    assert not _is_ordered(df, [(0, False, None)], False)
    # tie on the first key resolved by the second
    dft = pd.DataFrame({"a": [1, 1, 2], "b": [1, 2, 0]})
    assert _is_ordered(dft, [(0, False, None), (1, False, None)], True)
    assert not _is_ordered(dft, [(0, False, None), (1, True, None)], True)
    # NULL leading is sorted only under the nulls-smallest convention
    dfn = pd.DataFrame({"a": [None, 1.0, 2.0]})
    assert _is_ordered(dfn, [(0, False, None)], True)
    assert not _is_ordered(dfn, [(0, False, None)], False)
    # an explicit hint overrides BOTH convention candidates
    assert not _is_ordered(dfn, [(0, False, "last")], True)
    assert not _is_ordered(dfn, [(0, False, "last")], False)
    dfl = pd.DataFrame({"a": [1.0, 2.0, None]})
    assert _is_ordered(dfl, [(0, False, "last")], True)
    assert not _is_ordered(dfl, [(0, False, "first")], True)
    # Decimal columns compare numerically, not lexically
    from decimal import Decimal

    dfd = pd.DataFrame({"a": [Decimal("9.5"), Decimal("10.5")]})
    assert _is_ordered(dfd, [(0, False, None)], True)
