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

_REPO = os.path.dirname(os.path.abspath(__file__))
_PKG_ZIP: list[str] = []


def _ship_package(spark: SparkSession) -> None:
    """spark-submit --py-files analog: the driver owns the SparkSession, so
    its Python UDF workers may not have this repo on PYTHONPATH. Ship
    share_spark as a zip via addPyFile (idempotent per session)."""
    if getattr(spark, "_share_spark_shipped", False):
        return
    if not _PKG_ZIP:
        import shutil
        import tempfile

        base = os.path.join(tempfile.mkdtemp(prefix="share_spark_pkg_"), "share_spark")
        _PKG_ZIP.append(
            shutil.make_archive(base, "zip", root_dir=_REPO, base_dir="share_spark")
        )
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP[0])
    except Exception:
        pass  # e.g. Connect sessions; PYTHONPATH env fallback below
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    spark._share_spark_shipped = True


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return QUERIES["ft_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
