"""SSB workload (13 queries, reference's second benchmark flight) —
every query value-compared against its DuckDB oracle at sf0.001.

Mirrors the driver's correctness harness: rows sorted column-wise,
floats rounded inside both queries (round 6), exact equality on the
sorted tuples.
"""

import math
import os

import duckdb
import pytest

from terrier_spark.plans.ssb import SSB_ORACLES, SSB_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                round(v, 5) if isinstance(v, float) else v for v in r
            )
        )
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(SSB_QUERIES))
def test_ssb_matches_duckdb(spark, con, name):
    got = _norm([tuple(r) for r in SSB_QUERIES[name](spark, SF_DIR).collect()])
    exp = _norm([tuple(r) for r in con.execute(SSB_ORACLES[name]).fetchall()])
    assert len(got) == len(exp), (name, len(got), len(exp))
    for g, e in zip(got, exp):
        assert len(g) == len(e)
        for gv, ev in zip(g, e):
            if isinstance(gv, float) or isinstance(ev, float):
                assert gv is not None and ev is not None and math.isclose(
                    gv, ev, rel_tol=1e-9, abs_tol=1e-5
                ), (name, g, e)
            else:
                assert gv == ev, (name, g, e)
