"""Cross-engine building blocks (operators/xengine.py): the shared
whitespace class and md5 bucket must behave bit-identically in Spark
(Java regex) and DuckDB (RE2)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ocr_obsidian_spark.operators.xengine import WS_RE, md5_bucket


def test_ws_class_covers_x0b_in_both_engines(spark):
    # Java's \s includes \x0B, RE2's does not — the explicit class must
    # make both engines collapse it
    s = "a\x0bb\tc\nd"
    row = spark.createDataFrame([(s,)], "t string").select(
        F.regexp_replace("t", WS_RE, " ").alias("o")
    ).first()
    duck = duckdb.sql(
        f"SELECT regexp_replace('a'||chr(11)||'b'||chr(9)||'c'||chr(10)||'d',"
        f" '{WS_RE}', ' ', 'g')"
    ).fetchone()[0]
    assert row["o"] == duck == "a b c d"


def test_md5_bucket_matches_duckdb_twin(spark):
    keys = [(f"https://h/{i}",) for i in range(200)]
    got = {
        r["k"]: r["b"]
        for r in spark.createDataFrame(keys, "k string")
        .select("k", md5_bucket("k", 97).alias("b"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", keys)
    duck = dict(
        con.execute(
            "SELECT k, ('0x' || substr(md5(k), 1, 8))::BIGINT % 97 FROM t"
        ).fetchall()
    )
    assert got == duck
    assert all(0 <= b < 97 for b in got.values())
