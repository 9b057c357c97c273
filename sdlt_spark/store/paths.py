"""One shared decode for ``_metadata.file_path`` → plain os.path string.

Spark reports the scan's file path URI-escaped (space → %20, # → %23, a
literal % → %25 — verified empirically) but leaves ``+`` and non-ASCII
raw; ``url_decode`` is form-decoding (+ → space), so a literal ``+`` must
be protected as %2B first. Every join that keys on the file path (DV
anti-joins, partition/provenance maps, per-file constant columns) MUST
use this decode or file names with an encodable character silently miss
the join — resurrecting deleted rows or nulling partition values. The
invariant lives here exactly once; the three former copies (delta read,
vintage DV keying, partition attach) all call it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decoded_file_path(col: Column) -> Column:
    """URI-reported file path → decoded absolute os.path string."""
    p = F.regexp_replace(col, "^file:/+", "/")
    return F.url_decode(F.replace(p, F.lit("+"), F.lit("%2B")))
