from .build import IndexConfig, IndexReader, build_index  # noqa: F401
