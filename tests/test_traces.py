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
corpus can't silently shrink to skips.

With test_catalog_trace_analog (catalog.test, replayed against Spark's
own catalog because it introspects pg_attribute), all 13 trace files in
the reference corpus are covered."""

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
    ("aggregations.test", 22, 0),      # 24 observed (float-literal
                                       # pinning recovered the 2 gpa
                                       # HAVING skips)
    ("select.test", 143, 0),           # 147 observed; its ORDER BY queries
                                       # are SELECT * over joins — duplicate
                                       # output names make key binding
                                       # ambiguous, so they are conservatively
                                       # order-unchecked
    ("orderby.test", 12, 12),          # 13 / 13 observed
    ("nested-query.test", 23, 13),     # 25 / 15 observed (the 4 op-ANY
                                       # queries replay via validated
                                       # min/max/IN rewrites — 0 skips)
    ("functions.test", 125, 0),        # 129 observed (initcap oracle
                                       # emulation + Postgres concat/
                                       # LIKE-escape/left-right rewrites
                                       # recovered 7 former skips)
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


@pytest.mark.skipif(
    not os.path.isdir(TRACE_DIR), reason="reference trace corpus not present"
)
def test_catalog_trace_analog(spark):
    """Replay catalog.test — the one trace the cross-engine harness
    can't run (it introspects pg_attribute/pg_class, and DuckDB's
    pg_attribute compat normalizes VARCHAR(n) to typmod -1, so it can't
    oracle the n=55 case).  The semantic under test is: declared
    column-length metadata is observable through the CATALOG after
    CREATE TABLE (-1 for bare VARCHAR, n for VARCHAR(n)) and DROP
    removes the table.  Spark's catalog records the declared type in
    the __CHAR_VARCHAR_TYPE_STRING field-metadata key; the typmod
    analog reads it.  Expected values come from the trace file itself
    (its inline sqllogictest golden results), not from this test."""
    import re

    path = os.path.join(TRACE_DIR, "catalog.test")
    lines = open(path).read().splitlines()
    records = []  # ("statement", sql) | ("query", relname, [expected ints])
    i, n = 0, len(lines)
    while i < n:
        s = lines[i].strip()
        if not s or s.startswith("#"):
            i += 1
            continue
        if s.startswith("statement"):
            i += 1
            sql = []
            while i < n and lines[i].strip():
                sql.append(lines[i].strip())
                i += 1
            records.append(("statement", " ".join(sql)))
        elif s.startswith("query"):
            i += 1
            sql = []
            while i < n and lines[i].strip() != "----":
                sql.append(lines[i].strip())
                i += 1
            i += 1  # skip ----
            exp = []
            while i < n and lines[i].strip():
                exp.append(int(lines[i].strip()))
                i += 1
            m = re.search(r"relname\s*=\s*'(\w+)'", " ".join(sql))
            assert m, f"unrecognized catalog query: {' '.join(sql)}"
            records.append(("query", m.group(1), exp))
        else:
            i += 1
    # the trace must contain both the -1 and the 55 case, else the
    # replay silently degenerates
    queries = [r for r in records if r[0] == "query"]
    assert len(queries) == 2 and [q[2] for q in queries] == [[-1], [55]]

    def typmods(table):
        # qualify: earlier trace replays leave TEMP views (e.g. `t`)
        # that would shadow the session-catalog table here
        out = []
        for f in spark.table(f"default.{table}").schema.fields:
            m = re.fullmatch(
                r"varchar\((\d+)\)",
                f.metadata.get("__CHAR_VARCHAR_TYPE_STRING", ""),
            )
            out.append(int(m.group(1)) if m else -1)
        return out

    created = set()
    try:
        for rec in records:
            if rec[0] == "statement":
                sql = rec[1].rstrip(";")
                # qualify the DDL: other trace tests leave TEMP views
                # (e.g. `t`) that an unqualified name would resolve to —
                # DROP TABLE t would drop the view, not our table
                cm = re.match(r"CREATE\s+TABLE\s+(\w+)", sql, re.I)
                dm = re.match(r"DROP\s+TABLE\s+(\w+)", sql, re.I)
                if cm:
                    # dialect: Postgres bare VARCHAR is unlimited-length
                    # (typmod -1) — Spark spells that STRING and reserves
                    # VARCHAR for the parameterized form
                    sql = re.sub(r"\bVARCHAR\b(?!\s*\()", "STRING", sql, flags=re.I)
                    sql = re.sub(
                        r"^CREATE\s+TABLE\s+", "CREATE TABLE default.", sql, flags=re.I
                    )
                    # Spark needs an explicit provider for session-catalog
                    # tables; the trace's implicit heap is parquet here
                    spark.sql(f"{sql} USING parquet")
                    created.add(cm.group(1))
                elif dm:
                    spark.sql(f"DROP TABLE default.{dm.group(1)}")
                    created.discard(dm.group(1))
                    # the DROP semantics the trace relies on: the
                    # relation disappears from the catalog
                    assert not spark.catalog.tableExists(f"default.{dm.group(1)}")
                else:
                    spark.sql(sql)
            else:
                _, relname, exp = rec
                assert typmods(relname) == exp
    finally:
        for t in created:
            spark.sql(f"DROP TABLE IF EXISTS default.{t}")


def test_quantified_all_some_rewrites(spark):
    """op-ALL/SOME rewrite duals of the shipped op-ANY identities
    (VERDICT r4 item 2).  The reference corpus contains no op-ALL/SOME
    queries to validate against, so this synthetic trace drives every
    operator × quantifier × set-shape combination through the SAME
    replay loop: DuckDB executes the ORIGINAL quantified form as the
    oracle, Spark the rewrite — covering the empty-set (ALL = TRUE),
    NULL-in-set (never TRUE), and NULL-lhs corners the COUNT(*) guards
    in SPARK_REWRITES exist for."""
    from trace_replay import replay_records

    stmts = [
        ("statement_ok", "CREATE TABLE qt (a INT, b INT)"),
        (
            "statement_ok",
            "INSERT INTO qt VALUES (1, 10), (2, 20), (3, 30), "
            "(4, NULL), (NULL, 5)",
        ),
        ("statement_ok", "CREATE TABLE qs (v INT)"),
        ("statement_ok", "INSERT INTO qs VALUES (2), (3)"),
        ("statement_ok", "CREATE TABLE qn (v INT)"),
        ("statement_ok", "INSERT INTO qn VALUES (2), (NULL)"),
        ("statement_ok", "CREATE TABLE qe (v INT)"),  # stays empty
    ]
    queries = [
        (
            "query",
            f"SELECT a FROM qt WHERE a {op} {quant} "
            f"(SELECT v FROM {src}) ORDER BY a",
        )
        for op in ("=", "!=", "<>", "<", "<=", ">", ">=")
        for quant in ("ALL", "SOME", "ANY")
        for src in ("qs", "qn", "qe")
    ]
    res = replay_records(spark, stmts + queries, "synthetic-quantifiers")
    detail = "\n".join(
        f"  {' '.join(sql.split())[:100]} | {d[:120]}" for sql, d in res.failures
    )
    assert not res.failures, f"{len(res.failures)} mismatches\n{detail}"
    assert not res.skipped and not res.no_oracle
    assert res.passed == res.queries == len(queries)
