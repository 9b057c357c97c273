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


def resolve_table_path(root: str, p: str) -> str:
    """A Delta add/remove/cdc ``path`` (already URL-unquoted by log
    replay) → filesystem path. PROTOCOL.md allows paths RELATIVE to the
    table root *or ABSOLUTE* — the shallow-clone shape, where a cloned
    table's adds point straight at the source table's files. Plain
    absolute paths and ``file:`` URIs both occur in the wild."""
    import os

    if p.startswith("file:"):
        # file:///abs, file://host/abs, file:/abs -> the path part.
        # RFC 8089: after "file://" the segment up to the next '/' is the
        # AUTHORITY (host), not part of the path — '/'.lstrip alone would
        # fold 'localhost' into the filesystem path
        tail = p[len("file:"):]
        if tail.startswith("//"):
            rest = tail[2:]
            slash = rest.find("/")
            return rest[slash:] if slash >= 0 else "/"
        return "/" + tail.lstrip("/")
    if os.path.isabs(p):
        return p
    return os.path.join(root, p)



HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def decode_hive_segments(segs) -> dict:
    """Hive-style ``col=value`` path segments -> partitionValues dict:
    Hive %XX escaping decoded, ``__HIVE_DEFAULT_PARTITION__`` -> None.
    The ONE decoder shared by every staged partitionBy-output walk
    (data files, CDC change files, export split) so an escaping or
    null-marker fix can never drift between them."""
    import urllib.parse

    out: dict = {}
    for seg in segs:
        k, _, v = seg.partition("=")
        out[k] = None if v == HIVE_NULL else urllib.parse.unquote(v)
    return out
