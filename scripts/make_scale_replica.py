"""Build an sf1-equivalent dataset by replicating sf0.1 FACTOR times with
key offsets, so the bench suite can be run at a 10x scale point.

Replication preserves join fan-out and duplicate structure while keeping
cross-replica rows distinct (the SCALE.md methodology):

- Every key column is offset per replica by ``i * (max_key + 1)`` so
  orders/lineitem/customer/supplier/part joins keep exactly the sf0.1
  fan-out, 10x over.
- ``nation`` / ``region`` are fixed dimensions (as in TPC-H, they do not
  scale with SF) and are copied once.
- ``documents.text`` is passed through a per-replica Caesar cipher
  (identity for replica 0) — a bijection on letters, so within-replica
  duplicate/near-duplicate structure is preserved EXACTLY (dedup pair
  counts scale linearly) while cross-replica texts share no shingles
  (no artificial quadratic duplicate blow-up between replicas).
- ``embeddings.embedding`` gets a per-replica coordinate permutation —
  norm- and distance-preserving within a replica (cluster structure and
  in-replica near-dup pairs replicate exactly) while corresponding
  cross-replica vectors decorrelate to chance cosine.

Usage: python scripts/make_scale_replica.py [out_dir] [factor] [--adversarial]
Defaults: /tmp/sdlt_sf1 10. Round-10: factor 100 builds the sf10-equivalent
(100x) replica — ~1.7 GB of parquet — for the second decade of the heavy
dedup/ANN family's scale curve (SCALE.md round-10).

``--adversarial`` (round-9 verdict item 7) additionally plants the exact
failure modes the dedup bucket caps target, ON TOP of the replicated corpus:

- a **100k-copy duplicate cluster**: one boilerplate page repeated 100,000
  times under fresh doc_ids — identical docs agree on EVERY LSH band and
  EVERY simhash chunk, so uncapped candidate generation would emit ~5e9
  pairs per band from that one bucket;
- a **single hot shingle**: one twin per replica-0 document (doc_id <
  5000 at the default factor) carrying a fixed sentinel trigram — one
  shingle with df ≈ 5k, the quadratic hot key the ngram df-cap fences.

The planted rows are APPENDED (originals untouched), so the linear-scaling
properties of the base replica stay measurable alongside the stress rows.
"""

from __future__ import annotations

import os
import shutil
import string
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (table, [(key column, offset stride)]) — stride = max_key + 1 at sf0.1
KEYED = {
    "lineitem": [("l_orderkey", 150_000), ("l_partkey", 20_000),
                 ("l_suppkey", 1_000)],
    "orders": [("o_orderkey", 150_000), ("o_custkey", 15_000)],
    "customer": [("c_custkey", 15_000)],
    "supplier": [("s_suppkey", 1_000)],
    "part": [("p_partkey", 20_000)],
    "events": [("event_id", 100_000), ("user_id", 1_500)],
    "documents": [("doc_id", 5_000)],
}
COPY_ONCE = ["nation", "region"]

# Replicating FROM an already-replicated source (the two-level fourth-decade
# build: sf0.1 -> sf100 at factor 1000, then sf100 -> sf1000 at factor 10)
# needs key strides scaled to the SOURCE's key space, or offsets collide.
# SDLT_STRIDE_SCALE multiplies every stride in KEYED (e.g. 1000 when the
# source is the factor-1000 replica). Ciphers are seeded by the INNER
# replica index, so a two-level build reuses inner ciphers across outer
# replicas — fine for map/agg probes (sig, heavy_hitters: per-doc /
# per-token cost is text-content-independent) but NOT for candidate-volume
# ops (cross-outer-replica texts become byte-identical, planting artificial
# duplicate groups); SCALE.md fourth-decade rows note this.
STRIDE_SCALE = int(os.environ.get("SDLT_STRIDE_SCALE", "1"))


def _caesar_maps(i: int) -> tuple[str, str]:
    """Per-replica letter bijection. A plain Caesar rotation has only 26
    distinct shifts — at factor > 26 replicas i and i+26 would carry
    byte-IDENTICAL texts, planting artificial cross-replica duplicate
    groups. A seeded random permutation of the alphabet (26! >> factor)
    keeps every replica's cipher distinct while remaining a bijection on
    letters, so within-replica duplicate/near-duplicate structure still
    replicates exactly."""
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    if i == 0:
        return lo + up, lo + up
    perm = np.random.RandomState(987_000 + i).permutation(26)
    return (
        lo + up,
        "".join(lo[p] for p in perm) + "".join(up[p] for p in perm),
    )


def plant_adversarial(out_dir: str, clones: int = 100_000) -> None:
    """Append the 100k-duplicate cluster and hot-shingle rows to
    ``documents.parquet`` (see module docstring)."""
    con = duckdb.connect()
    path = f"{out_dir}/documents.parquet"
    hi = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{path}')"
    ).fetchone()[0]
    boiler = (
        "subscribe to our newsletter terms of service privacy policy "
        "all rights reserved copyright contact us about careers"
    )
    tmp = f"{out_dir}/.documents_adv.parquet"
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{path}')
          UNION ALL
          -- one hot-shingle twin per replica-0 doc: same text plus the
          -- sentinel trigram -> one shingle shared by ~n_docs documents
          SELECT doc_id + {hi + 1} AS doc_id,
                 text || ' zzhot zzhot zzhot' AS text,
                 lang, source, n_chars + 18 AS n_chars
          FROM read_parquet('{path}') WHERE doc_id < 5000
          UNION ALL
          -- the 100k-copy boilerplate cluster
          SELECT {hi + 1} + 5000 + u.i AS doc_id,
                 '{boiler}' AS text,
                 'en' AS lang, 'adversarial' AS source,
                 CAST(length('{boiler}') AS BIGINT) AS n_chars
          FROM (SELECT unnest(range({clones})) AS i) u
        ) TO '{tmp}' (FORMAT PARQUET)
        """
    )
    os.replace(tmp, path)
    n = con.execute(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
    print("documents (adversarial)", n)


def build(out_dir: str, factor: int, only: set[str] | None = None) -> None:
    """``only`` restricts the build to a table subset (plus the fixed
    dims) — the factor-1000 sf100 replica (round-11 third decade) needs
    just documents + embeddings for the LLM-pipeline family; replicating
    600M lineitem rows would cost ~18 GB and an hour for ops that never
    read them."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # factor-1000 builds union 1000 SELECT branches; duckdb's default
    # parser depth (1000) trips just under it
    con.execute("SET max_expression_depth TO 20000")

    for t in COPY_ONCE:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")

    for t, keys in KEYED.items():
        if only is not None and t not in only:
            continue
        parts = []
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        for i in range(factor):
            sel = []
            for c in cols:
                expr = c
                for k, stride in keys:
                    if c == k:
                        expr = f"({c} + {i * stride * STRIDE_SCALE})"
                if t == "documents" and c == "text" and i > 0:
                    src_chars, dst_chars = _caesar_maps(i)
                    expr = f"translate(text, '{src_chars}', '{dst_chars}')"
                sel.append(f"{expr} AS {c}")
            parts.append(
                f"SELECT {', '.join(sel)} "
                f"FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )

    if only is not None and "embeddings" not in only:
        for t in (set(KEYED) & (only or set(KEYED))) | set(COPY_ONCE):
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
            ).fetchone()[0]
            print(t, n)
        return

    # embeddings: numpy path for the per-replica coordinate permutation
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    emb = np.stack(tbl.column("embedding").to_pandas().to_numpy())
    dim = emb.shape[1]
    out_ids, out_lbl, out_emb = [], [], []
    for i in range(factor):
        perm = (np.arange(dim) if i == 0
                else np.random.RandomState(1234 + i).permutation(dim))
        out_ids.append(vec_ids + i * 2_000)
        out_lbl.append(labels)
        out_emb.append(emb[:, perm])
    all_emb = np.concatenate(out_emb).astype(np.float32)
    out = pa.table({
        "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(all_emb.reshape(-1), type=pa.float32()), dim
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(out_lbl), type=pa.int32()),
    })
    pq.write_table(out, f"{out_dir}/embeddings.parquet")

    built = list(KEYED) if only is None else [t for t in KEYED if t in only]
    for t in built + COPY_ONCE + ["embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    only = None
    args = []
    adversarial = False
    for a in sys.argv[1:]:
        if a == "--adversarial":
            adversarial = True
        elif a.startswith("--tables="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            args.append(a)
    out = args[0] if args else "/tmp/sdlt_sf1"
    factor = int(args[1]) if len(args) > 1 else 10
    build(out, factor, only)
    if adversarial:
        plant_adversarial(out)
