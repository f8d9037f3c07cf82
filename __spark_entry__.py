"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship job: build the inverted index over the
sf0.001 ``documents`` table with the engine
(``textindex_spark.build``), then answer a BM25 top-10 query
(``textindex_spark.query``). ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 plus the training-data ops,
each paired with the DuckDB-equivalent SQL (see
``textindex_spark/gate.py``; ``tools/check_gate.py`` replays the
comparison locally).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index build + BM25 top-k on /root/testdata/sf0.001."""
    from textindex_spark import gate
    from textindex_spark.query import search

    sf_dir = "/root/testdata/sf0.001"
    idx = gate.ensure_index(spark, sf_dir)
    return search(spark, idx, ["spark", "quer*"], k=10, mode="and")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from textindex_spark import gate

    return dict(gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    from textindex_spark import gate

    return gate.oracle_sql_map()
