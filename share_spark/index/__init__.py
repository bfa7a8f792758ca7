from .build import IndexConfig, IndexReader, build_index  # noqa: F401
from .snapshots import (  # noqa: F401
    SnapshotExpiredError,
    current_snapshot,
    expire_snapshots,
    read_snapshots,
)
