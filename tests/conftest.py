from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from share_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("share_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    from share_spark.corpus import make_web_pages

    return make_web_pages(300, seed=42)


@pytest.fixture(scope="session")
def built_index(spark, pages_pdf, tmp_path_factory):
    """A small built index shared across query tests."""
    from share_spark.index.build import IndexConfig, IndexReader, build_index

    idx_dir = str(tmp_path_factory.mktemp("index"))
    pages = spark.createDataFrame(pages_pdf)
    cfg = IndexConfig(analyzer="standard", block_size=32, chunk_docs=64)
    build_index(spark, pages, idx_dir, cfg)
    return IndexReader.open(spark, idx_dir)
