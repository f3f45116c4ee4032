"""JDBC source/sink/ET executed for real against embedded Derby (the
derby jars ship with Spark for the Hive metastore — no extra install).

Converts the round-1 "claimed, never executed" JDBC paths
(sources/registry.py jdbc load/save, operators/map_ops.py JDBC ET;
reference MLSQLJDBC.scala / MLSQLDirectJDBC.scala:55-82 /
SQLJDBC.scala:46-170) into proven ones."""

import pytest


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby")
    spark._jvm.System.setProperty("derby.system.home", str(home))
    url = f"jdbc:derby:{home}/db;create=true"
    return url


@pytest.fixture(scope="module")
def jdbc_engine(spark, derby):
    """One engine for the module: `connect` meta is session state, and
    the tests build on each other's tables (REPL semantics)."""
    from streamingpro_spark import Engine
    eng = Engine(spark)
    eng.execute(
        f'connect jdbc where url="{derby}" and '
        'driver="org.apache.derby.jdbc.EmbeddedDriver" as derbydb;')
    return eng


def test_jdbc_et_ddl_load_save_roundtrip(jdbc_engine):
    engine = jdbc_engine
    engine.execute('''
    select 1 as a as t;
    run t as JDBC.`derbydb` where
        `driver-statement-0`="CREATE TABLE items(id INT, name VARCHAR(20))"
        and `driver-statement-1`="INSERT INTO items VALUES (1,'x'),(2,'y'),(3,'z')"
        as s;
    ''')
    df = engine.execute(
        'load jdbc.`derbydb.items` as items; '
        'select * from items order by id as out;')
    assert [(r["ID"], r["NAME"]) for r in df.collect()] == \
        [(1, "x"), (2, "y"), (3, "z")]
    # save append goes through df.write.format("jdbc")
    df = engine.execute('''
    select 4 as id, 'w' as name as newrow;
    save append newrow as jdbc.`derbydb.items`;
    load jdbc.`derbydb.items` as items2;
    select count(*) as n from items2 as out;
    ''')
    assert df.collect()[0]["n"] == 4


def test_jdbc_direct_query_pushdown(jdbc_engine):
    engine = jdbc_engine
    """directQuery ships the SQL to the database (Spark `query` option);
    the filter runs DB-side, not in Spark."""
    df = engine.execute(
        'load jdbc.`derbydb.items` where directQuery="true" and '
        'sql="SELECT id, name FROM items WHERE id >= 2" as dq; '
        'select * from dq order by id as out;')
    rows = df.collect()
    assert [r["ID"] for r in rows] == [2, 3, 4]
    # the scan relation itself carries the pushed query, no Spark Filter
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "items WHERE id >= 2" in plan.replace("\n", " ")


def test_jdbc_driver_statement_query(jdbc_engine):
    engine = jdbc_engine
    df = engine.execute('''
    select 1 as a as t;
    run t as JDBC.`derbydb` where
        `driver-statement-query`="SELECT COUNT(*) AS N FROM items" as q;
    ''')
    assert df.collect()[0]["N"] == 4


def test_jdbc_updat_ext_updates_by_key(jdbc_engine):
    """Default (staged) strategy: distributed write to a staging table +
    one set-based UPDATE; no staging table left behind."""
    engine = jdbc_engine
    df = engine.execute('''
    select 2 as id, 'YY' as name as upd;
    run upd as JDBCUpdatExt.`derbydb.items` where keyCol="id" as s;
    ''')
    assert df.collect()[0]["updated"] == 1
    df = engine.execute(
        'load jdbc.`derbydb.items` as items3; '
        'select name from items3 where id = 2 as out;')
    assert df.collect()[0]["name"] == "YY"
    # the staging table was dropped
    df = engine.execute('''
    select 1 as a as t;
    run t as JDBC.`derbydb` where
        `driver-statement-query`="SELECT COUNT(*) AS N FROM SYS.SYSTABLES WHERE TABLENAME LIKE '%STAGE%'" as q;
    ''')
    assert df.collect()[0]["N"] == 0


def test_jdbc_updat_ext_driver_strategy_typed_values(jdbc_engine):
    """strategy=driver exercises the typed PreparedStatement binders:
    timestamp, date, decimal, and NULL (ADVICE: raw setObject breaks on
    all four)."""
    engine = jdbc_engine
    engine.execute('''
    select 1 as a as t;
    run t as JDBC.`derbydb` where
        `driver-statement-0`="CREATE TABLE typed(id INT, ts TIMESTAMP, d DATE, amt DECIMAL(10,2), note VARCHAR(20))"
        and `driver-statement-1`="INSERT INTO typed VALUES (1, TIMESTAMP('2020-01-01 00:00:00'), DATE('2020-01-01'), 1.00, 'old')"
        as s;
    ''')
    df = engine.execute('''
    select 1 as id, timestamp'2024-01-02 03:04:05.123' as ts,
           date'2024-03-04' as d, cast(9.75 as decimal(10,2)) as amt,
           cast(null as string) as note as upd;
    run upd as JDBCUpdatExt.`derbydb.typed` where keyCol="id"
        and strategy="driver" as s2;
    ''')
    assert df.collect()[0]["updated"] == 1
    row = engine.execute(
        'load jdbc.`derbydb.typed` as typed2; '
        'select * from typed2 where id = 1 as out;').collect()[0]
    assert str(row["TS"]).startswith("2024-01-02 03:04:05.123")
    assert str(row["D"]) == "2024-03-04"
    assert float(row["AMT"]) == 9.75
    assert row["NOTE"] is None


def test_jdbc_updat_ext_staged_multi_column_and_null(jdbc_engine):
    """Staged strategy on a multi-SET-column table with NULL + timestamp
    values (types handled by Spark's JDBC writer, no py4j binding)."""
    engine = jdbc_engine
    df = engine.execute('''
    select 1 as id, timestamp'2025-05-06 07:08:09' as ts,
           cast(null as date) as d, cast(2.50 as decimal(10,2)) as amt,
           'new' as note as upd;
    run upd as JDBCUpdatExt.`derbydb.typed` where keyCol="id" as s3;
    ''')
    assert df.collect()[0]["updated"] == 1
    row = engine.execute(
        'load jdbc.`derbydb.typed` as typed3; '
        'select * from typed3 where id = 1 as out;').collect()[0]
    assert str(row["TS"]).startswith("2025-05-06 07:08:09")
    assert row["D"] is None
    assert float(row["AMT"]) == 2.5
    assert row["NOTE"] == "new"
