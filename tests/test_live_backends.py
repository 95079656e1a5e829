"""Opt-in LIVE-backend smoke tests (round-12 verdict item 7 / the
standing "what's missing" list): a real PostgreSQL JDBC round-trip and a
real S3/MinIO TSV write+read. The sandbox has no network, so these SKIP
cleanly unless a networked operator opts in via env vars — the skip
reason names exactly what is missing and how to supply it.

How to run them for real (see README "Live-backend smoke tests"):

  PostgreSQL:
    SPARK_GRAFT_LIVE_PG_URL='jdbc:postgresql://host:5432/db?user=U&password=P'
    SPARK_GRAFT_EXTRA_JARS=/path/to/postgresql-42.7.x.jar   # before JVM launch
    python -m pytest tests/test_live_backends.py -q

  S3 (or MinIO):
    SPARK_GRAFT_LIVE_S3_BASE='s3a://my-bucket/spark-graft-smoke'
    SPARK_GRAFT_EXTRA_PACKAGES='org.apache.hadoop:hadoop-aws:3.4.1'
    AWS_ACCESS_KEY_ID=... AWS_SECRET_ACCESS_KEY=...
    # MinIO / custom endpoint additionally:
    SPARK_GRAFT_LIVE_S3_ENDPOINT='http://localhost:9000'
    python -m pytest tests/test_live_backends.py -q

Run them in their OWN pytest invocation: the classpath vars only take
effect when this process creates the JVM (getOrCreate ignores conf once
a session exists).
"""

from __future__ import annotations

import os
import uuid

import pytest

LIVE_PG_URL = os.environ.get("SPARK_GRAFT_LIVE_PG_URL")
LIVE_S3_BASE = os.environ.get("SPARK_GRAFT_LIVE_S3_BASE")
LIVE_S3_ENDPOINT = os.environ.get("SPARK_GRAFT_LIVE_S3_ENDPOINT")

_PG_SKIP = (
    "live PostgreSQL smoke needs SPARK_GRAFT_LIVE_PG_URL="
    "'jdbc:postgresql://host:5432/db?user=U&password=P' and the "
    "postgresql JDBC driver on the classpath "
    "(SPARK_GRAFT_EXTRA_JARS=/path/to/postgresql-42.7.x.jar, set "
    "before the JVM launches)"
)
_S3_SKIP = (
    "live S3/MinIO smoke needs SPARK_GRAFT_LIVE_S3_BASE="
    "'s3a://bucket/prefix', hadoop-aws on the classpath "
    "(SPARK_GRAFT_EXTRA_PACKAGES='org.apache.hadoop:hadoop-aws:3.4.1'), "
    "and AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY (plus "
    "SPARK_GRAFT_LIVE_S3_ENDPOINT for MinIO)"
)


def _sample(spark):
    return spark.createDataFrame(
        [
            (1, "Byt 2+kk, Praha", 3_500_000.0),
            (2, "Dům 5+1, Brno", 12_000_000.0),
            (3, "Pozemek, Plzeň", 900_000.0),
        ],
        "id bigint, title string, price double",
    )


def _props_df(spark):
    # the gold-table shape write_jdbc's createTableColumnTypes declares
    import datetime

    return spark.createDataFrame(
        [
            ("sale", "addr1", "Praha", 50, "2+kk", 5_000_000, 100_000,
             "http://x/1", datetime.datetime(2024, 1, 1), "a.csv"),
            ("rent", "addr2", "Brno", 80, "3+1", 30_000, 375,
             "http://x/2", datetime.datetime(2024, 1, 2), "b.csv"),
        ],
        "purpose string, address string, region string, size_m2 int, "
        "design string, price_czk int, price_per_m2 int, link string, "
        "dump_date timestamp, file_name string",
    )


@pytest.mark.skipif(not LIVE_PG_URL, reason=_PG_SKIP)
def test_live_postgres_jdbc_roundtrip(spark):
    # write through the engine's JDBC sink against a REAL server, read
    # back through Spark's JDBC source, compare values — the round trip
    # the embedded-Derby tests cannot prove (dialect + wire protocol)
    from real_estate_project1_etl_spark.sinks.writers import write_jdbc

    table = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
    df = _props_df(spark)
    try:
        write_jdbc(df, LIVE_PG_URL, table=table, mode="overwrite")
        back = (
            spark.read.format("jdbc")
            .option("url", LIVE_PG_URL)
            .option("dbtable", table)
            .load()
        )
        keep = ["purpose", "address", "price_czk", "price_per_m2"]
        got = {tuple(r) for r in back.select(*keep).collect()}
        want = {tuple(r) for r in df.select(*keep).collect()}
        assert got == want
        assert dict(back.dtypes)["price_per_m2"] == "int"
        assert dict(back.dtypes)["dump_date"] == "timestamp"
    finally:
        # drop the smoke table via a throwaway JDBC action
        try:
            import py4j  # noqa: F401

            jvm = spark.sparkContext._jvm
            conn = jvm.java.sql.DriverManager.getConnection(LIVE_PG_URL)
            try:
                conn.createStatement().execute(
                    f'DROP TABLE IF EXISTS "{table}"'
                )
            finally:
                conn.close()
        except Exception:
            pass  # cleanup best-effort; the table name is unique


@pytest.mark.skipif(not LIVE_S3_BASE, reason=_S3_SKIP)
def test_live_s3_tsv_write_read_roundtrip(spark):
    # write the reference-shape TSV through the engine's sink to a REAL
    # object store, read it back through the engine's source, compare —
    # the s3a profile (session.object_store_conf) has otherwise never
    # touched a real store in this sandbox
    from real_estate_project1_etl_spark.sinks.writers import write_tsv
    from real_estate_project1_etl_spark.sources.csv import read_tsv

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if LIVE_S3_ENDPOINT:  # MinIO / custom endpoint
        hconf.set("fs.s3a.endpoint", LIVE_S3_ENDPOINT)
        hconf.set("fs.s3a.path.style.access", "true")
        hconf.set("fs.s3a.connection.ssl.enabled",
                  str(LIVE_S3_ENDPOINT.startswith("https")).lower())
    path = f"{LIVE_S3_BASE.rstrip('/')}/tsv_{uuid.uuid4().hex[:8]}"

    df = _sample(spark)
    write_tsv(df, path)
    back = read_tsv(
        spark, path, schema="id bigint, title string, price double",
        header=True,
    )
    got = {r["id"]: (r["title"], r["price"]) for r in back.collect()}
    want = {r["id"]: (r["title"], r["price"]) for r in df.collect()}
    assert got == want
