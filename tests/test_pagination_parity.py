"""Round-12 closure of the T-SQL pagination gap (VERDICT r11 task 6).

The sqlserver dialect preserves the reference's pagination SQL
string-for-string (TableToDbRowFn.java:80-89: ``ORDER BY pk OFFSET n *
(i - 1) ROWS FETCH NEXT n ROWS ONLY``), but no SQL Server exists in
this sandbox, so three compensating validations exercise the template
beyond string equality:

1. a grammar-level parse of the emitted clause against the published
   T-SQL ORDER BY pagination grammar (OFFSET <expr> {ROW|ROWS} FETCH
   {FIRST|NEXT} <expr> {ROW|ROWS} ONLY), including evaluating the
   arithmetic skip expression and checking it equals offset·(page−1);
2. live execution of the ANSI OFFSET…FETCH shape on Apache Derby (the
   second in-process engine after DuckDB), paging a real table; and
3. the parity check that matters for correctness: the union of all
   OFFSET/FETCH pages equals the production range-predicate scan's
   row set exactly — no skips, no duplicates.
"""

from __future__ import annotations

import re

import pytest

from dlp_rdb_bq_import_spark.sources.dialects import get_dialect
from dlp_rdb_bq_import_spark.sources.jdbc_source import JdbcSource

URL = "jdbc:derby:memory:pagetest;create=true"
N_ROWS = 57  # deliberately not a multiple of the page size


# ---------------------------------------------------------------------------
# 1. grammar-level validation of the T-SQL pagination clause
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"\s*(\d+|\(|\)|\*|\+|-)")


def _parse_int_expr(text: str) -> tuple[int, str]:
    """Recursive-descent parser for the integer arithmetic T-SQL allows
    in OFFSET/FETCH expressions: INT | '(' expr ')' with * + - chains.
    Returns (value, remaining_text); raises on anything else."""

    def term(s: str) -> tuple[int, str]:
        m = _TOKEN.match(s)
        if not m:
            raise ValueError(f"expected term at: {s!r}")
        tok, rest = m.group(1), s[m.end() :]
        if tok == "(":
            v, rest = expr(rest)
            m2 = _TOKEN.match(rest)
            if not m2 or m2.group(1) != ")":
                raise ValueError(f"expected ')' at: {rest!r}")
            return v, rest[m2.end() :]
        if tok.isdigit():
            return int(tok), rest
        raise ValueError(f"unexpected token {tok!r}")

    def expr(s: str) -> tuple[int, str]:
        v, s = term(s)
        while True:
            m = _TOKEN.match(s)
            if not m or m.group(1) not in "*+-":
                return v, s
            op, s2 = m.group(1), s[m.end() :]
            w, s = term(s2)
            v = v * w if op == "*" else (v + w if op == "+" else v - w)

    return expr(text)


_PAGING = re.compile(
    r"^SELECT \* FROM (\S+)\.(\S+) ORDER BY (\S+) "
    r"OFFSET (?P<skip>.+?) ROWS? FETCH (?:NEXT|FIRST) (?P<fetch>.+?) ROWS? ONLY$"
)


def test_tsql_pagination_clause_parses_and_evaluates():
    """Every emitted sqlserver page query must match the published
    T-SQL pagination grammar, and its OFFSET arithmetic must evaluate
    to offset·(page−1) with the FETCH count equal to the page size —
    a structural check that survives template edits, not a string pin."""
    d = get_dialect("sqlserver")
    for offset, page in ((500, 1), (500, 3), (10, 7), (1, 1), (250, 12)):
        sql = d.paged_scan_sql("dbo", "orders", "o_orderkey", offset, page)
        m = _PAGING.match(sql)
        assert m, sql
        skip_val, rest = _parse_int_expr(m.group("skip"))
        assert rest.strip() == "", f"trailing junk in OFFSET expr: {rest!r}"
        assert skip_val == offset * (page - 1)
        fetch_val, rest = _parse_int_expr(m.group("fetch"))
        assert rest.strip() == "" and fetch_val == offset


def test_all_dialect_page_templates_parse():
    """The postgres/mysql/derby templates must also emit structurally
    valid pagination (OFFSET/FETCH or LIMIT/OFFSET) with the right
    evaluated skip."""
    lim = re.compile(
        r"^SELECT \* FROM \S+\.\S+ ORDER BY \S+ LIMIT (\d+) OFFSET (\d+)$"
    )
    for name in ("postgresql", "derby"):
        sql = get_dialect(name).paged_scan_sql("s", "t", "id", 20, 4)
        m = _PAGING.match(sql)
        assert m, (name, sql)
        assert _parse_int_expr(m.group("skip"))[0] == 60
    m = lim.match(get_dialect("mysql").paged_scan_sql("s", "t", "id", 20, 4))
    assert m and (int(m.group(1)), int(m.group(2))) == (20, 60)


# ---------------------------------------------------------------------------
# 2 + 3. Derby-executed OFFSET/FETCH pages vs the range-predicate scan
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def derby_pages(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE ITEMS (ITEM_ID INT PRIMARY KEY, LABEL VARCHAR(30))"
    )
    ps = conn.prepareStatement("INSERT INTO ITEMS VALUES (?, ?)")
    # non-contiguous ids so OFFSET pages and range predicates disagree
    # about BOUNDARIES but must agree about the total row set
    for i in range(N_ROWS):
        ps.setInt(1, 3 * i + 7)
        ps.setString(2, f"item_{i}")
        ps.addBatch()
    ps.executeBatch()
    ps.close()
    st.close()
    yield conn
    conn.close()


def _run_query(conn, sql: str) -> list[tuple[int, str]]:
    st = conn.createStatement()
    rs = st.executeQuery(sql)
    out = []
    while rs.next():
        out.append((rs.getInt(1), rs.getString(2)))
    rs.close()
    st.close()
    return out


def test_derby_offset_fetch_pages_tile_exactly(spark, derby_pages):
    """The ANSI ``OFFSET … ROWS FETCH NEXT … ROWS ONLY`` shape executes
    live on Derby: pages are disjoint, ordered, and tile the table."""
    d = get_dialect("derby")
    seen: list[int] = []
    page = 1
    while True:
        rows = _run_query(
            derby_pages, d.paged_scan_sql("APP", "ITEMS", "ITEM_ID", 10, page)
        )
        if not rows:
            break
        assert rows == sorted(rows)  # ordered within the page
        seen += [r[0] for r in rows]
        page += 1
    assert page == 7  # 5 full pages + 1 partial + 1 empty
    assert seen == [3 * i + 7 for i in range(N_ROWS)]


def test_derby_pages_match_range_predicate_scan(spark, derby_pages):
    """VERDICT r11 task 6 'Done' condition: the OFFSET/FETCH pagination
    path (the reference's strategy, executed live on Derby) and the
    production range-predicate scan return IDENTICAL row sets."""
    d = get_dialect("derby")
    paged: set[tuple[int, str]] = set()
    page = 1
    while True:
        rows = _run_query(
            derby_pages, d.paged_scan_sql("APP", "ITEMS", "ITEM_ID", 10, page)
        )
        if not rows:
            break
        before = len(paged)
        paged.update(rows)
        assert len(paged) == before + len(rows)  # no duplicates across pages
        page += 1
    src = JdbcSource(URL, catalog_strategy="metadata")
    tables = {t.name: t for t in src.list_tables(spark)}
    df = src.read_table(spark, tables["ITEMS"], offset_count=10)
    ranged = {(r["ITEM_ID"], r["LABEL"]) for r in df.collect()}
    assert ranged == paged and len(ranged) == N_ROWS


def test_sqlserver_arithmetic_form_evaluates_to_derby_pages(spark, derby_pages):
    """The reference-verbatim arithmetic OFFSET form, with its skip
    expression evaluated by the grammar parser above (not by string
    substitution), produces exactly the page Derby serves for the same
    (offset, page) — tying the T-SQL template's semantics to a live
    engine without an actual SQL Server."""
    ss = get_dialect("sqlserver")
    derby = get_dialect("derby")
    for page in (1, 2, 6):
        sql = ss.paged_scan_sql("APP", "ITEMS", "ITEM_ID", 10, page)
        m = _PAGING.match(sql)
        skip_val, _ = _parse_int_expr(m.group("skip"))
        fetch_val, _ = _parse_int_expr(m.group("fetch"))
        rebuilt = (
            f"SELECT * FROM APP.ITEMS ORDER BY ITEM_ID "
            f"OFFSET {skip_val} ROWS FETCH NEXT {fetch_val} ROWS ONLY"
        )
        assert _run_query(derby_pages, rebuilt) == _run_query(
            derby_pages, derby.paged_scan_sql("APP", "ITEMS", "ITEM_ID", 10, page)
        )
