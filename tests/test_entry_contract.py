"""Driver-contract sanity (no Spark session needed)."""

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, o - q
    # substantial SQL-checkable coverage
    assert len(o) >= 16
    assert len(q) >= 23


def test_perplexity_model_tables_in_sync(tmp_path):
    """The checked-in parquet model tables (data/ppl_*.parquet) must
    equal a fresh export of the in-memory model — the oracle is only
    exact while they agree."""
    import pyarrow.parquet as pq

    from json_remedy_spark.functions.perplexity import export_model_tables

    tri = tmp_path / "tri.parquet"
    bi = tmp_path / "bi.parquet"
    export_model_tables(str(tri), str(bi))
    for fresh, checked_in in [(tri, entry._PPL_TRI_TABLE), (bi, entry._PPL_BI_TABLE)]:
        a = pq.read_table(str(fresh)).to_pydict()
        b = pq.read_table(checked_in).to_pydict()
        assert a == b


def test_ann_recall_floors(spark):
    """The approximate ANN paths must clear their recall floors vs the
    exact top-k at sf0.01 (VERDICT r2 #5: LSH >= 0.6, IVF >= 0.8)."""
    rows = entry.q_ann_recall(spark, "/root/testdata/sf0.01").collect()
    recall = {r["method"]: r["recall_at_5"] for r in rows}
    assert recall["lsh"] >= 0.6, recall
    assert recall["ivf"] >= 0.8, recall


def test_oracle_sql_is_wellformed_duckdb():
    import duckdb

    # export-oracle SQLs read_parquet() /tmp paths the queries write;
    # on a fresh host none has run yet — materialize empty placeholders
    entry.ensure_export_placeholders()
    con = duckdb.connect()
    for t in entry.TABLES:
        p = f"/root/testdata/sf0.001/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name, sql in entry.oracle_sql().items():
        # parse + plan without executing (EXPLAIN) — catches syntax and
        # unknown-function regressions cheaply
        con.sql(f"EXPLAIN {sql}")
