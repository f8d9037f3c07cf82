"""Shared Spark fixtures/helpers for the engine tests."""
from __future__ import annotations

import pytest

from textindex_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("textindex-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


def corpus_df(spark, rows):
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    data = [
        (
            r["doc_id"],
            r["url"],
            r["warc_ts"].replace(tzinfo=None) if r.get("warc_ts") else None,
            r["html"],
            r["text"],
            r["lang"],
        )
        for r in rows
    ]
    return spark.createDataFrame(data, schema)
