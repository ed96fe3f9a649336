"""Driver-contract sanity (no Spark session needed)."""

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, o - q
    # substantial SQL-checkable coverage
    assert len(o) >= 16
    assert len(q) >= 23


def test_oracle_sql_is_wellformed_duckdb():
    import duckdb

    con = duckdb.connect()
    for t in entry.TABLES:
        p = f"/root/testdata/sf0.001/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name, sql in entry.oracle_sql().items():
        # parse + plan without executing (EXPLAIN) — catches syntax and
        # unknown-function regressions cheaply
        con.sql(f"EXPLAIN {sql}")
