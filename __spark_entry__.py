"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship BM25 top-k over /root/testdata/sf0.001 documents
queries()      -> operator registry (share_spark/queries.py), one entry per
                  implemented operator from SURVEY.md §2 + pipeline extensions
oracle_sql()   -> DuckDB-runnable ANSI SQL twins, column-name/type aligned
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from share_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["ft_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
