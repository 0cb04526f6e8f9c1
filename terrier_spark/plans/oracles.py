"""DuckDB oracle SQL for every SQL-expressible queries() entry.

Rules that keep the driver's comparison (row-count + schema +
order-insensitive value hash) honest:
- every computed column carries the SAME alias as the Spark plan;
- DuckDB round() returns DECIMAL → always ::DOUBLE;
- DuckDB sum(int) returns HUGEINT → always ::BIGINT;
- double aggregates rounded to 6 (money) or 9 (scores/ratios) on BOTH
  sides before comparison.
"""

from __future__ import annotations

from terrier_spark.functions.text_stats import LANG_MARKERS, STOPWORDS
from terrier_spark.plans.textqueries import BM25_QUERY

_TOK = "[^a-z0-9_]+"  # pinned tokenizer pattern (oracle.py / tokenize.py)


def _sql_list(words: list[str]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def _bm25_terms() -> str:
    return _sql_list(sorted(set(BM25_QUERY.lower().split())))


ORACLES: dict[str, str] = {}

# ------------------------------------------------------------ relational

ORACLES["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice), 6)::DOUBLE AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6)::DOUBLE AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)::DOUBLE AS sum_charge,
       round(avg(l_quantity), 6)::DOUBLE AS avg_qty,
       round(avg(l_extendedprice), 6)::DOUBLE AS avg_price,
       round(avg(l_discount), 6)::DOUBLE AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 6)::DOUBLE AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-06-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ORACLES["q5_local_supplier"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 6)::DOUBLE AS revenue
FROM region
JOIN nation   ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON o_orderkey  = l_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

ORACLES["q6_revenue"] = """
SELECT round(sum(l_extendedprice * l_discount), 6)::DOUBLE AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

ORACLES["q4_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["q7_volume_shipping"] = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 6)::DOUBLE AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN lineitem  ON l_suppkey   = s_suppkey
    JOIN orders    ON o_orderkey  = l_orderkey
    JOIN customer  ON c_custkey   = o_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
        OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

ORACLES["q11_important_suppliers"] = """
SELECT l_suppkey,
       round(sum(l_extendedprice * (1 - l_discount)), 6)::DOUBLE AS total_value
FROM lineitem
GROUP BY l_suppkey
HAVING sum(l_extendedprice * (1 - l_discount)) >
       1.02 * (SELECT sum(l_extendedprice * (1 - l_discount))
                      / count(DISTINCT l_suppkey)
               FROM lineitem)
ORDER BY l_suppkey
"""

ORACLES["q16_supplier_parts"] = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLES["q18_large_orders"] = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 6)::DOUBLE AS o_totalprice,
       round(sum(l_quantity), 6)::DOUBLE AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY round(o_totalprice, 6) DESC, o_orderkey
LIMIT 100
"""

ORACLES["q19_disjunctive_revenue"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 6)::DOUBLE AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 40
       AND l_quantity BETWEEN 20 AND 35)
"""

ORACLES["q_topk_limit_offset"] = """
SELECT 'topk' AS op, o_orderkey, o_totalprice FROM (
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
)
UNION ALL
SELECT 'offset' AS op, o_orderkey, o_totalprice FROM (
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 100
)
ORDER BY op, o_orderkey
"""

ORACLES["q_semi_anti_join"] = """
SELECT 'semi' AS op, c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 100000
)
UNION ALL
SELECT 'anti' AS op, c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
ORDER BY op, c_custkey
"""

ORACLES["q_outer_joins"] = """
SELECT 'left' AS op, c_custkey::BIGINT AS key,
       count(o_orderkey)::BIGINT AS n,
       coalesce(round(sum(o_totalprice), 6)::DOUBLE, 0.0) AS amt
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
UNION ALL
SELECT 'right' AS op, c_custkey::BIGINT AS key,
       count(o_orderkey)::BIGINT AS n,
       coalesce(round(sum(o_totalprice), 6)::DOUBLE, 0.0) AS amt
FROM (SELECT * FROM orders WHERE year(o_orderdate) = 1995) o
RIGHT JOIN customer ON o.o_custkey = c_custkey
GROUP BY c_custkey
UNION ALL
SELECT 'full' AS op, key, n, amt FROM (
    WITH a AS (
        SELECT c_nationkey, count(*) AS n_cust
        FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey
    ), b AS (
        SELECT s_nationkey, count(*) AS n_supp
        FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
    )
    SELECT coalesce(a.c_nationkey, b.s_nationkey)::BIGINT AS key,
           coalesce(a.n_cust, 0)::BIGINT AS n,
           coalesce(b.n_supp, 0)::DOUBLE AS amt
    FROM a FULL OUTER JOIN b ON a.c_nationkey = b.s_nationkey
)
ORDER BY op, key
"""

ORACLES["q_having"] = """
SELECT l_suppkey,
       count(*) AS n_items,
       round(sum(l_quantity), 6)::DOUBLE AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) > 400
ORDER BY l_suppkey
"""

ORACLES["q_window_rank"] = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""

# (epoch_us(ts) // 1000000): FLOOR of the fractional-second epoch,
# matching Spark's ts.cast('long') truncation — epoch(ts)::BIGINT
# ROUNDS in DuckDB, so an event with fraction >= .5 got a different
# epoch second than the engine and a gap near the 1800 s threshold
# could split a session in one engine only (review finding r4; latent
# on the seed-42 data, which has no boundary gaps).
ORACLES["q_sessionize"] = """
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN (epoch_us(ts) // 1000000)
                     - lag(epoch_us(ts) // 1000000) OVER w IS NULL
                  OR (epoch_us(ts) // 1000000)
                     - lag(epoch_us(ts) // 1000000) OVER w > 1800
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
    ) AS session_no
    FROM flagged
)
SELECT user_id, session_no::BIGINT AS session_no,
       count(*) AS n_events,
       round(sum(value), 6)::DOUBLE AS session_value
FROM sessions
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""

ORACLES["q_setops"] = """
SELECT 'union' AS op, nationkey::VARCHAR AS k1, NULL::VARCHAR AS k2 FROM (
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'intersect' AS op, nationkey::VARCHAR, NULL::VARCHAR FROM (
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'except' AS op, nationkey::VARCHAR, NULL::VARCHAR FROM (
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT DISTINCT 'distinct' AS op, o_orderstatus, o_orderpriority
FROM orders
ORDER BY op, k1, k2
"""

ORACLES["q_case_string"] = """
SELECT p_partkey,
       upper(substring(p_name, 1, 8)) AS name_prefix,
       lpad(p_brand, 12, '#') AS brand_padded,
       length(p_type) AS type_len,
       CASE WHEN p_type LIKE '%BRASS%' THEN 'brass'
            WHEN p_size > 30 THEN 'large'
            ELSE 'other' END AS category,
       p_brand || '-' || p_size::VARCHAR AS brand_size
FROM part
ORDER BY p_partkey
"""

ORACLES["q_date_extract"] = """
SELECT year(o_orderdate)::BIGINT AS yr,
       quarter(o_orderdate)::BIGINT AS qtr,
       count(*) AS n_orders
FROM orders
GROUP BY 1, 2
ORDER BY yr, qtr
"""

ORACLES["q_rollup"] = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 6)::DOUBLE AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""

ORACLES["q_subqueries"] = """
SELECT 'in' AS op, o_orderkey, round(o_totalprice, 6)::DOUBLE AS o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
UNION ALL
SELECT 'scalar' AS op, o_orderkey, round(o_totalprice, 6)::DOUBLE AS o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
ORDER BY op, o_orderkey
"""

ORACLES["q_events_tumbling"] = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6)::DOUBLE AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""

ORACLES["q_theta_band_join"] = """
SELECT 'nlj' AS op, a.s_suppkey::BIGINT AS k1, b.s_suppkey::BIGINT AS k2,
       round(abs(a.s_acctbal - b.s_acctbal), 6)::DOUBLE AS bal_diff
FROM supplier a
JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND abs(a.s_acctbal - b.s_acctbal) < 1.0
UNION ALL
SELECT 'band' AS op, a.c_custkey::BIGINT AS k1, b.c_custkey::BIGINT AS k2,
       round(abs(a.c_acctbal - b.c_acctbal), 6)::DOUBLE AS bal_diff
FROM customer a
JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND abs(a.c_acctbal - b.c_acctbal) < 0.05
ORDER BY op, k1, k2
"""

ORACLES["q_scalar_funcs"] = """
SELECT o_orderkey,
       trim('  ' || o_orderpriority || '  ') AS s_trim,
       ltrim('  ' || o_orderpriority || '  ') AS s_ltrim,
       rtrim('  ' || o_orderpriority || '  ') AS s_rtrim,
       array_to_string(
           list_transform(string_split(o_orderpriority, ' '),
                          w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))),
           ' ') AS s_initcap,
       reverse(o_orderpriority) AS s_reverse,
       split_part(o_orderpriority, '-', 2) AS s_split_part,
       strpos(o_orderpriority, '-')::BIGINT AS s_position,
       repeat(o_orderstatus, 3) AS s_repeat,
       left(o_orderpriority, 3) AS s_left,
       right(o_orderpriority, 3) AS s_right,
       ascii(o_orderstatus)::BIGINT AS s_ascii,
       chr(65 + (o_orderkey % 26)::INTEGER) AS s_chr,
       dayofweek(o_orderdate)::BIGINT AS d_dow,
       dayofyear(o_orderdate)::BIGINT AS d_doy,
       weekofyear(o_orderdate)::BIGINT AS d_week,
       month(o_orderdate)::BIGINT AS d_month,
       dayofmonth(o_orderdate)::BIGINT AS d_day,
       hour(o_orderdate)::BIGINT AS d_hour,
       round(abs(o_totalprice - 100000.0), 6)::DOUBLE AS m_abs,
       (o_orderkey % 7)::BIGINT AS m_mod,
       round(pow(1.0001, (o_orderkey % 100)::DOUBLE), 6)::DOUBLE AS m_pow,
       round(o_totalprice / 7.0, 2)::DOUBLE AS m_round,
       round(sqrt(o_totalprice), 6)::DOUBLE AS m_sqrt,
       round(cbrt(o_totalprice), 6)::DOUBLE AS m_cbrt,
       ceil(o_totalprice / 1000.0)::BIGINT AS m_ceil,
       floor(o_totalprice / 1000.0)::BIGINT AS m_floor,
       round(exp(o_totalprice / 1000000.0), 6)::DOUBLE AS m_exp,
       round(ln(o_totalprice), 6)::DOUBLE AS m_ln,
       round(log10(o_totalprice), 6)::DOUBLE AS m_log10,
       round(log2(o_totalprice), 6)::DOUBLE AS m_log2,
       round(sin(o_totalprice / 100000.0), 6)::DOUBLE AS m_sin,
       round(cos(o_totalprice / 100000.0), 6)::DOUBLE AS m_cos,
       round(atan2(o_totalprice / 100000.0, 2.0), 6)::DOUBLE AS m_atan2,
       sign(o_totalprice - 150000.0)::BIGINT AS m_sign
FROM orders
WHERE o_orderkey % 97 = 0
ORDER BY o_orderkey
"""

# q_dml_roundtrip also carries the CSVScan round-trip (tricky column
# with delimiter/quote chars IN the data) and the constant-tuple Result
# node (cross-joined literals) — consolidated r4 to free a driver slot
# for ir_proximity.
ORACLES["q_dml_roundtrip"] = """
WITH del AS (
    SELECT * FROM supplier WHERE NOT coalesce(s_acctbal < 0, FALSE)
), upd AS (
    SELECT s_suppkey, s_name, s_nationkey,
           CASE WHEN s_nationkey = 3
                THEN round(s_acctbal * 1.1, 2)::DOUBLE
                ELSE s_acctbal END AS s_acctbal
    FROM del
), ins AS (
    SELECT s_suppkey + 10000 AS s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier WHERE s_acctbal > 9000
)
SELECT s_suppkey, s_name, s_nationkey::BIGINT AS s_nationkey,
       round(s_acctbal, 6)::DOUBLE AS s_acctbal,
       s_name || ',"' || s_nationkey || '"' AS tricky,
       k.*
FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
CROSS JOIN (
    SELECT 1::BIGINT AS one,
           (2 + 3)::BIGINT AS five,
           'hello' AS greeting,
           round(3.14 * 2, 6)::DOUBLE AS tau,
           upper('abc') AS upper_abc
) k
ORDER BY s_suppkey
"""

ORACLES["q_index_lookup"] = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 6)::DOUBLE AS o_totalprice
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 5
)
ORDER BY o_orderkey
"""

ORACLES["q_approx_stats"] = """
WITH s AS (
    SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_distinct,
           sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
           min(o_orderkey)::VARCHAR AS min_str, max(o_orderkey)::VARCHAR AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(DISTINCT o_custkey),
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
           min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(DISTINCT o_orderstatus),
           sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(DISTINCT o_orderpriority),
           sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
)
SELECT * FROM s ORDER BY col_name
"""

ORACLES["q_salted_agg"] = """
SELECT l_suppkey,
       count(l_quantity) AS n_items,
       round(sum(l_quantity), 6)::DOUBLE AS total_qty,
       round(max(l_quantity), 6)::DOUBLE AS max_qty
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""

ORACLES["q_sketch_stats"] = f"""
WITH mm AS (
    SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
), binned AS (
    SELECT least(floor((o_totalprice - mm.lo) / (mm.hi - mm.lo) * 16),
                 15)::BIGINT AS bin
    FROM orders, mm WHERE o_totalprice IS NOT NULL
), c AS (
    SELECT bin, count(*) AS cnt FROM binned GROUP BY bin
), g AS (
    SELECT unnest(range(0, 16)) AS bin, mm.lo, mm.hi FROM mm
), toks AS (
    SELECT unnest(list_filter(string_split_regex(lower(text), '{_TOK}'),
                              x -> x <> '')) AS term
    FROM documents
), tc AS (
    SELECT term AS value, count(*) AS cnt FROM toks GROUP BY term
), topk AS (
    SELECT value, cnt,
           row_number() OVER (ORDER BY cnt DESC, value) AS rank
    FROM tc
    ORDER BY cnt DESC, value
    LIMIT 20
)
SELECT 'hist' AS op,
       g.bin::BIGINT AS idx,
       NULL::VARCHAR AS label,
       round(g.lo + g.bin * ((g.hi - g.lo) / 16), 6)::DOUBLE AS lo,
       round(g.lo + (g.bin + 1) * ((g.hi - g.lo) / 16), 6)::DOUBLE AS hi,
       coalesce(c.cnt, 0)::BIGINT AS cnt
FROM g LEFT JOIN c USING (bin)
UNION ALL
SELECT 'topk' AS op,
       rank::BIGINT AS idx,
       value AS label,
       NULL::DOUBLE AS lo,
       NULL::DOUBLE AS hi,
       cnt::BIGINT AS cnt
FROM topk
ORDER BY op, idx
"""

# ------------------------------------------------------------- IR / text

ORACLES["ir_term_stats"] = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '{_TOK}'),
                              x -> x <> '')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
)
SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY term ORDER BY term
"""

ORACLES["ir_collection_stats"] = f"""
WITH dl AS (
    SELECT len(list_filter(string_split_regex(lower(text), '{_TOK}'),
                           x -> x <> '')) AS dl
    FROM documents
)
SELECT count(*) AS num_docs,
       sum(dl)::BIGINT AS num_tokens,
       round(sum(dl)::DOUBLE / count(*), 6)::DOUBLE AS avgdl
FROM dl
"""


def _bm25_sql(terms: str | None = None) -> str:
    terms = terms or _bm25_terms()
    return f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '{_TOK}'),
                              x -> x <> '')) AS tok
    FROM documents
), dl AS (
    SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), cs AS (
    SELECT (SELECT count(*) FROM documents) AS n,
           (SELECT sum(dl)::DOUBLE FROM dl)
               / (SELECT count(*) FROM documents) AS avgdl
), tf AS (
    SELECT doc_id, tok, count(*) AS tf FROM toks
    WHERE tok IN ({terms})
    GROUP BY doc_id, tok
), dft AS (
    SELECT tok, count(*) AS df FROM tf GROUP BY tok
), sc AS (
    SELECT tf.doc_id,
           sum( ln((cs.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                * tf.tf * 2.2
                / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cs.avgdl)) ) AS s
    FROM tf
    JOIN dft USING (tok)
    JOIN dl  USING (doc_id)
    CROSS JOIN cs
    GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 9)::DOUBLE AS score
FROM sc
ORDER BY score DESC, doc_id
LIMIT 10
"""


def _bm25_and_sql() -> str:
    """Conjunctive (AND) variant: only docs containing EVERY query term
    — and empty if any query term is absent from the collection."""
    terms = _bm25_terms()
    q_n = len(set(BM25_QUERY.lower().split()))
    base = _bm25_sql()
    return base.replace(
        "    GROUP BY tf.doc_id\n)",
        f"    GROUP BY tf.doc_id\n"
        f"    HAVING count(DISTINCT tf.tok) = {q_n}\n"
        f"       AND (SELECT count(*) FROM dft) = {q_n}\n)",
    )


ORACLES["ir_bm25_topk"] = _bm25_sql()
# The WAND block path is rank-identical by construction — same oracle.
ORACLES["ir_bm25_topk_wand"] = _bm25_sql()
ORACLES["ir_bm25_topk_and"] = _bm25_and_sql()


def _bm25_batch_sql() -> str:
    """Per-query oracle twin of ir_bm25_batch: the single-query SQL,
    wrapped with (qid, rank) and UNION ALL'd over the batch set — the
    driver compares the whole-set result against the engine's one-pass
    evaluation."""
    from terrier_spark.plans.textqueries import BM25_BATCH_QUERIES

    parts = []
    for qid in sorted(BM25_BATCH_QUERIES):
        terms = _sql_list(sorted(set(BM25_BATCH_QUERIES[qid].lower().split())))
        one = _bm25_sql(terms).strip().rstrip()
        parts.append(
            f"SELECT '{qid}' AS qid, doc_id, score,\n"
            f"       row_number() OVER (ORDER BY score DESC, doc_id) AS rank\n"
            f"FROM (\n{one}\n) q_{qid}"
        )
    return "\nUNION ALL\n".join(parts)


ORACLES["ir_bm25_batch"] = _bm25_batch_sql()


def _phrase_sql() -> str:
    """Positional self-join phrase match: pos table from zipped unnest +
    generate_subscripts (1-based; adjacency is offset-invariant), one
    join leg per phrase position, exact overlapping-occurrence count."""
    from terrier_spark.plans.textqueries import PHRASE_QUERY

    terms = PHRASE_QUERY.lower().split()
    joins = "\n".join(
        f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
        f" AND p{i}.pos = p0.pos + {i} AND p{i}.term = '{t}'"
        for i, t in enumerate(terms[1:], start=1)
    )
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '{_TOK}'),
                       x -> x <> '') AS l
    FROM documents
), pos AS (
    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
    FROM toks
)
SELECT p0.doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_occ
FROM pos p0
{joins}
WHERE p0.term = '{terms[0]}'
GROUP BY p0.doc_id
ORDER BY doc_id
"""


ORACLES["ir_phrase"] = _phrase_sql()


def _proximity_sql() -> str:
    """Exact #uwN min-span twin: per doc, the query terms' occurrence
    stream ordered by position; at each occurrence (a candidate window
    END) a per-term running max gives that term's latest position so
    far, so the candidate window START is the least of them — the same
    exhaustive ends-scan argument as the engine kernel (a minimal
    window always ends at some term occurrence)."""
    from terrier_spark.plans.textqueries import PROX_QUERY, PROX_WINDOW

    terms = sorted(set(PROX_QUERY.lower().split()))
    run_cols = ",\n".join(
        f"           max(CASE WHEN term = '{t}' THEN pos END) OVER w AS p{i}"
        for i, t in enumerate(terms)
    )
    pcols = ", ".join(f"p{i}" for i in range(len(terms)))
    notnull = " AND ".join(f"p{i} IS NOT NULL" for i in range(len(terms)))
    span = f"pos - least({pcols}) + 1"
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '{_TOK}'),
                       x -> x <> '') AS l
    FROM documents
), occ AS (
    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
    FROM toks
), runs AS (
    SELECT doc_id, pos,
{run_cols}
    FROM occ
    WHERE term IN ({_sql_list(terms)})
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id::BIGINT AS doc_id, min({span})::BIGINT AS min_span
FROM runs
WHERE {notnull}
GROUP BY doc_id
HAVING min({span}) <= {PROX_WINDOW}
ORDER BY doc_id
"""


ORACLES["ir_proximity"] = _proximity_sql()

ORACLES["text_stats"] = f"""
WITH tok_counts AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''))::BIGINT AS n_ws_tokens,
           len(list_filter(string_split_regex(lower(text), '{_TOK}'),
                           x -> x <> ''))::BIGINT AS n_code_tokens
    FROM documents
),
base AS (
    SELECT doc_id,
           length(text) AS n_chars,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks,
           length(text)
             - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
    FROM documents
), feat AS (
    SELECT doc_id,
           n_chars,
           len(toks) AS n_tokens,
           CASE WHEN len(toks) > 0
                THEN n_chars::DOUBLE / len(toks) ELSE 0.0 END AS avg_token_len_raw,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, x -> x IN ({_sql_list(STOPWORDS)})))::DOUBLE
                     / len(toks)
                ELSE 0.0 END AS stop_raw,
           CASE WHEN n_chars > 0
                THEN n_punct::DOUBLE / n_chars ELSE 0.0 END AS punct_raw
    FROM base
)
SELECT doc_id,
       tc.n_ws_tokens,
       tc.n_code_tokens,
       n_chars::BIGINT AS n_chars,
       n_tokens::BIGINT AS n_tokens,
       round(avg_token_len_raw, 9)::DOUBLE AS avg_token_len,
       round(stop_raw, 9)::DOUBLE AS stopword_ratio,
       round(punct_raw, 9)::DOUBLE AS punct_ratio,
       round( least(n_tokens / 100.0, 1.0) * 0.4
            + least(stop_raw * 4.0, 1.0) * 0.3
            + (1.0 - least(punct_raw * 5.0, 1.0)) * 0.3, 9)::DOUBLE AS quality_score,
       lid.lang_guess,
       sha.content_sha
FROM feat JOIN tok_counts tc USING (doc_id)
JOIN ({{langid_body}}) lid USING (doc_id)
JOIN (SELECT doc_id, sha256(text) AS content_sha FROM documents) sha USING (doc_id)
ORDER BY doc_id
"""


def _langid_sql(order: bool = True) -> str:
    langs = sorted(LANG_MARKERS)
    counts = ",\n           ".join(
        f"len(list_filter(toks, x -> x IN ({_sql_list(LANG_MARKERS[lg])}))) AS c_{lg}"
        for lg in langs
    )
    # first-alphabetical wins ties: each branch uses >= against later langs
    branches = []
    for i, lg in enumerate(langs):
        conds = [f"c_{lg} >= c_{other}" for other in langs[i + 1:]]
        branches.append(
            f"WHEN {' AND '.join(conds)} THEN '{lg}'" if conds else f"ELSE '{lg}'"
        )
    case = "CASE " + " ".join(branches) + " END"
    return f"""
SELECT doc_id, {case} AS lang_guess
FROM (
    SELECT doc_id,
           {counts}
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    )
){" ORDER BY doc_id" if order else ""}
"""


# langid is folded into the merged text_stats entry (50-entry recording
# window); the standalone SQL stays exposed for tests/debugging.
ORACLES["text_stats"] = ORACLES["text_stats"].replace(
    "{langid_body}", _langid_sql(order=False)
)
LANGID_SQL = _langid_sql()

# Winnowing k=8/w=16 with the shared Karp-Rabin polynomial gram hash
# (text_stats.WINNOW_B/WINNOW_M): hash = sum ord(char_j) * B^(7-j) mod M,
# exact in BIGINT on both engines.  Certifies the Arrow kernel path.
def _winnow_sql(k: int = 8, w: int = 16) -> str:
    from terrier_spark.functions.text_stats import WINNOW_M, winnow_powers

    # {p}::BIGINT: powers fit INTEGER, but ord * power overflows INT32
    # and DuckDB raises on integer overflow rather than promoting.
    gram = " + ".join(
        f"ord(substr(t, (pos + {j})::INTEGER, 1)) * {p}::BIGINT"
        for j, p in enumerate(winnow_powers(k))
    )
    return f"""
WITH norm AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
    FROM documents
), grams AS (
    SELECT doc_id, i AS pos,
           ({gram}) % {WINNOW_M} AS h
    FROM (
        SELECT doc_id, t, unnest(range(1, length(t) - {k - 2})) AS i
        FROM norm WHERE length(t) >= {k}
    )
)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
FROM grams
ORDER BY doc_id, fp
"""


ORACLES["text_fingerprints"] = _winnow_sql()

ORACLES["dedup_exact_docs"] = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS survivor_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
ORDER BY fp
"""

ORACLES["dedup_ngram_pairs"] = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS l
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(l) >= 2
                THEN list_distinct([l[i] || ' ' || l[i+1] for i in range(1, len(l))])
                ELSE [] END AS s
    FROM toks
), ex AS (
    SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh
), pairs AS (
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           a.n_sh AS n1, b.n_sh AS n2,
           count(*) AS inter
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT id1, id2,
       round(inter::DOUBLE / (n1 + n2 - inter), 9)::DOUBLE AS jaccard
FROM pairs
WHERE round(inter::DOUBLE / (n1 + n2 - inter), 9) >= 0.12
ORDER BY id1, id2
"""

# MinHash-LSH at the entry's banding (4 rows × 32 bands, threshold 0.5)
# has band-curve recall ≥ 0.9999 and an exact verify step, so the output
# equals the exact all-pairs result — oracle = brute-force bigram
# Jaccard at the same threshold.
ORACLES["dedup_minhash_pairs"] = ORACLES["dedup_ngram_pairs"].replace(
    "0.12", "0.5"
)


def _simhash_md5_sql(bits: int = 60, max_hamming: int = 3) -> str:
    """Recompute the 60-bit md5 SimHash in SQL and brute-force pairs —
    matches dedup.simhash_pairs_md5 exactly (same md5-prefix token hash,
    same bit votes, same >0 sign rule)."""
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok
    FROM documents
), hashed AS (
    SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
), votes AS (
    SELECT doc_id,
           {bit_sums}
    FROM hashed GROUP BY doc_id
), sig AS (
    SELECT doc_id, {sig} AS simhash FROM votes
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY id1, id2
"""


ORACLES["dedup_simhash_pairs"] = _simhash_md5_sql()

# Hyperplane-LSH near-dup at the entry's banding (2 bits x 32 bands) has
# recall ~1-9e-8 at threshold 0.4 → equals the brute-force scan.
ORACLES["emb_neardup_pairs"] = """
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(list_cosine_similarity(
           CAST(a.embedding AS DOUBLE[]),
           CAST(b.embedding AS DOUBLE[])), 9)::DOUBLE AS cos
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(
           CAST(a.embedding AS DOUBLE[]),
           CAST(b.embedding AS DOUBLE[])), 9) >= 0.4
ORDER BY id1, id2
"""

ORACLES["emb_cosine_topk"] = """
SELECT vec_id,
       round(list_cosine_similarity(
           CAST(embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
       ), 9)::DOUBLE AS cos
FROM embeddings
ORDER BY cos DESC, vec_id
LIMIT 25
"""

# IVF probed exhaustively (nprobe = n_centroids) is exact — same result
# contract as the brute-force cosine top-k.
ORACLES["emb_ivf_full"] = ORACLES["emb_cosine_topk"]

# ---------------------------------------------------- IVF probe oracle
#
# emb_ivf_topk was the one driver entry without an exact oracle (its
# centroids come from a seeded k-means no SQL can replay).  VERDICT r4
# item 1: the centroids are DATA, not semantics — the entry PUBLISHES
# them (publish_ivf_centroids, an atomic single-file parquet at a path
# fixed at import time), and the oracle recomputes EVERYTHING
# downstream of them from first principles:
#   assignment  — per-vector argmin of Euclidean distance over the
#                 published centroids (ties → lowest cluster, matching
#                 np.argmin's first-min), certifying ivf_assign AND the
#                 partitioned write/reload round-trip;
#   probe set   — the nprobe=3 centroids nearest the query vector
#                 (ties → lowest cluster, matching stable np.argsort);
#   result      — exact cosine top-25 over vectors assigned to probed
#                 clusters, same rounding/tie-break as every cosine
#                 oracle.
# The only trust left in Spark is the centroid VALUES themselves —
# parameters of the ANN structure, like a query constant.  list_distance
# is Euclidean (monotone in the squared distance numpy minimizes).

IVF_PUB_PATH = None  # set below; embedded in the SQL at import time


def _ivf_pub_path() -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"terrier_spark_ivf_pub_{os.getuid()}.parquet"
    )


IVF_PUB_PATH = _ivf_pub_path()


def publish_ivf_centroids(centroids) -> str:
    """Atomically publish the trained centroids (float64) as one parquet
    file at IVF_PUB_PATH so the emb_ivf_topk oracle can read them.
    Called by the entry on every invocation — 8 rows, driver-side
    pyarrow, no Spark job; os.replace keeps concurrent readers off a
    half-written file."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "cluster": pa.array(range(len(centroids)), pa.int32()),
            "centroid": pa.array(
                [[float(x) for x in c] for c in centroids],
                pa.list_(pa.float64()),
            ),
        }
    )
    tmp = f"{IVF_PUB_PATH}.tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, IVF_PUB_PATH)
    return IVF_PUB_PATH


ORACLES["emb_ivf_topk"] = f"""
WITH cents AS (
    SELECT cluster, CAST(centroid AS DOUBLE[]) AS centroid
    FROM read_parquet('{IVF_PUB_PATH}')
), q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), probe AS (
    SELECT c.cluster
    FROM cents c, q
    ORDER BY list_distance(c.centroid, q.qv), c.cluster
    LIMIT 3
), assign AS (
    SELECT vec_id, embedding, cluster,
           row_number() OVER (
               PARTITION BY vec_id
               ORDER BY list_distance(CAST(embedding AS DOUBLE[]), centroid),
                        cluster
           ) AS rn
    FROM embeddings CROSS JOIN cents
)
SELECT a.vec_id,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), q.qv),
             9)::DOUBLE AS cos
FROM assign a, q
WHERE a.rn = 1 AND a.cluster IN (SELECT cluster FROM probe)
ORDER BY cos DESC, a.vec_id
LIMIT 25
"""

ORACLES["emb_knn_per_label"] = """
WITH scored AS (
    SELECT label, vec_id,
           round(list_cosine_similarity(
               CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
           ), 9)::DOUBLE AS cos
    FROM embeddings
), ranked AS (
    SELECT label, vec_id, cos,
           row_number() OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS rnk
    FROM scored
)
SELECT label, vec_id, cos, rnk FROM ranked WHERE rnk <= 3
ORDER BY label, rnk
"""

# 8-bin byte histogram of the utf-8 payload, L1-normalized — the
# deterministic stand-in feature extractor (functions/multimodal.py
# fake_features: np.histogram(bytes, bins=8, range=(0,256)) / n).
# Documents are ASCII, so ord(char) == byte value; bin = byte // 32.
# Also carries the former mm_byte_stats columns (media_type, n_bytes
# of the binary payload) repeated per feature row — consolidated r3.
ORACLES["mm_features"] = """
WITH counts AS (
    SELECT doc_id, ord(substr(text, i, 1)) // 32 AS feat_idx,
           count(*) AS c
    FROM (
        SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        FROM documents
    )
    GROUP BY 1, 2
), grid AS (
    SELECT doc_id, length(text) AS n, unnest(range(0, 8)) AS feat_idx
    FROM documents
)
SELECT g.doc_id,
       'image/fake' AS media_type,
       octet_length(encode(d.text))::BIGINT AS n_bytes,
       g.feat_idx::BIGINT AS feat_idx,
       round(CASE WHEN g.n > 0
                  THEN coalesce(c.c, 0)::DOUBLE / g.n
                  ELSE 0.0 END, 9)::DOUBLE AS value
FROM grid g
JOIN documents d ON g.doc_id = d.doc_id
LEFT JOIN counts c ON g.doc_id = c.doc_id AND g.feat_idx = c.feat_idx
ORDER BY g.doc_id, g.feat_idx
"""

# q_prepared: the two parameter bindings inlined as a params relation —
# one SQL statement covering both EXECUTEs of the prepared statement.
ORACLES["q_prepared"] = """
WITH params AS (
    SELECT 'y1996' AS binding, TIMESTAMP '1996-01-01' AS lo,
           TIMESTAMP '1997-01-01' AS hi, 0.05 AS dmin, 0.07 AS dmax
    UNION ALL
    SELECT 'y1998_99', TIMESTAMP '1998-01-01',
           TIMESTAMP '2000-01-01', 0.03, 0.06
)
SELECT p.binding,
       round(sum(l.l_extendedprice * l.l_discount), 6)::DOUBLE AS revenue,
       count(*) AS n_rows
FROM lineitem l
JOIN params p
  ON l.l_shipdate >= p.lo AND l.l_shipdate < p.hi
 AND l.l_discount BETWEEN p.dmin AND p.dmax
 AND l.l_quantity < 24
GROUP BY p.binding
ORDER BY p.binding
"""
