"""Query-based incremental CDC over JDBC (polling capture): exactly-once
increments against a LIVE embedded Derby database, end-to-end into the
engine's change feed and materialized state."""

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.catalog import EndpointSpec, SourceCatalog
from sample_dms_kinesis_rds_mariadb_spark.sources.changefeed import ChangeFeed
from sample_dms_kinesis_rds_mariadb_spark.sources.jdbc_poll import (
    JdbcPollingCapture,
)


def _seed_derby(spark, tmp_path):
    db = str(tmp_path / "polldb")
    jvm = spark._jvm
    jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log")
    )
    conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE accounts (id INT PRIMARY KEY, balance INT, version INT)"
    )
    st.executeUpdate("INSERT INTO accounts VALUES (1, 100, 1), (2, 200, 1)")
    st.close()
    return db, conn


def _capture(spark, db):
    cat = SourceCatalog(spark)
    cat.register_endpoint(
        EndpointSpec(
            "derby-poll",
            "jdbc",
            {
                "url": f"jdbc:derby:{db}",
                "driver": "org.apache.derby.jdbc.EmbeddedDriver",
                "tables": ["APP.accounts"],
                "schema_name": "APP",
            },
        )
    )
    return JdbcPollingCapture(
        cat, "derby-poll", "APP", "accounts", cursor_col="VERSION"
    )


def test_polling_capture_exactly_once_increments(spark, tmp_path):
    db, conn = _seed_derby(spark, tmp_path)
    cap = _capture(spark, db)
    feed = ChangeFeed(spark, str(tmp_path / "feed"))

    # pump 1: initial snapshot — every existing row, op=insert
    assert cap.pump(feed) == 2
    rows = feed.read_batch().collect()
    assert sorted(r["data"]["ID"] for r in rows) == ["1", "2"]
    assert {r["op"] for r in rows} == {"insert"}

    # pump 2: nothing changed — boundary rows must NOT re-deliver
    assert cap.pump(feed) == 0

    # change the source: update one row (bump cursor), insert a new one
    st = conn.createStatement()
    st.executeUpdate("UPDATE accounts SET balance = 150, version = 2 WHERE id = 1")
    st.executeUpdate("INSERT INTO accounts VALUES (3, 300, 2)")
    st.close()

    # pump 3: exactly the two changed rows, as updates (full images)
    assert cap.pump(feed) == 2
    inc = [
        r
        for r in feed.read_batch().collect()
        if r["op"] == "update"
    ]
    got = {r["data"]["ID"]: r["data"]["BALANCE"] for r in inc}
    assert got == {"1": "150", "3": "300"}

    # pump 4: quiescent again
    assert cap.pump(feed) == 0


def test_polling_capture_feeds_the_apply_path(spark, tmp_path):
    """The captured feed drives the engine's materializer: final state
    equals the live database's state (deletes excluded by design)."""
    from sample_dms_kinesis_rds_mariadb_spark.streaming.apply import (
        TableMaterializer,
    )
    from sample_dms_kinesis_rds_mariadb_spark.streaming.schema_evolution import (
        TableRegistry,
    )

    db, conn = _seed_derby(spark, tmp_path)
    cap = _capture(spark, db)
    feed = ChangeFeed(spark, str(tmp_path / "feed"))
    cap.pump(feed)
    st = conn.createStatement()
    st.executeUpdate("UPDATE accounts SET balance = 999, version = 2 WHERE id = 2")
    st.close()
    cap.pump(feed)

    registry = TableRegistry()
    shape = spark.createDataFrame([], "ID long, BALANCE long, VERSION long")
    registry.register_from_df("APP", "accounts", shape, primary_key="ID")
    mat = TableMaterializer(spark, registry, str(tmp_path / "state"), n_buckets=4)
    mat.overwrite("APP", "accounts", shape)
    batch = feed.read_batch().withColumn(
        "ddl",
        F.lit(None).cast(
            "struct<action:string,column:string,type:string,default:string>"
        ),
    )
    assert mat.apply_change_batch(batch) == []
    state = {
        r["ID"]: r["BALANCE"] for r in mat.table("APP", "accounts").collect()
    }
    assert state == {1: 100, 2: 999}


def test_polling_capture_initial_now_skips_history(spark, tmp_path):
    db, _conn = _seed_derby(spark, tmp_path)
    cap = _capture(spark, db)
    cap._initial = "now"
    feed = ChangeFeed(spark, str(tmp_path / "feed"))
    assert cap.pump(feed) == 0  # history skipped
    st = _conn.createStatement()
    st.executeUpdate("INSERT INTO accounts VALUES (9, 900, 5)")
    st.close()
    assert cap.pump(feed) == 1
    rows = feed.read_batch().collect()
    assert [r["data"]["ID"] for r in rows] == ["9"]


def test_polling_capture_rejects_bad_initial(spark, tmp_path):
    import pytest

    db, _conn = _seed_derby(spark, tmp_path)
    cat = SourceCatalog(spark)
    with pytest.raises(ValueError, match="initial"):
        JdbcPollingCapture(cat, "e", "s", "t", "c", initial="bogus")


def test_polling_cursor_predicate_pushes_to_jdbc(spark, tmp_path):
    """The increment filter must reach the JDBC WHERE clause — each poll
    transfers only the increment, never the table."""
    db, _conn = _seed_derby(spark, tmp_path)
    cat = SourceCatalog(spark)
    cat.register_endpoint(
        EndpointSpec(
            "derby-poll",
            "jdbc",
            {
                "url": f"jdbc:derby:{db}",
                "driver": "org.apache.derby.jdbc.EmbeddedDriver",
                "tables": ["APP.accounts"],
                "schema_name": "APP",
            },
        )
    )
    df = cat.load("derby-poll", "APP", "accounts").filter(
        F.col("VERSION") >= F.lit(5)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    assert "GreaterThanOrEqual(VERSION,5)" in plan  # inside PushedFilters
