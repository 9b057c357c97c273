"""Versioned-table storage layer (the reference's Delta Lake role).

``delta-spark`` is not available in this environment, so the vintage
semantics the reference gets from Delta Lake (versioned commits, merge/
delete/update, time travel, history, schema evolution, compaction, vacuum —
``/root/reference/README.md:92-415``) are provided by
:class:`sdlt_spark.store.vintage.VintageTable`: immutable parquet data files
plus a JSON commit log, with Delta-style copy-on-write that rewrites only
the files actually touched by a mutation.
"""

from sdlt_spark.store.vintage import (
    CommitConflictError,
    ConstraintViolationError,
    MissingChangeDataError,
    VintageTable,
)

__all__ = [
    "VintageTable",
    "CommitConflictError",
    "ConstraintViolationError",
    "MissingChangeDataError",
]
