"""Model-based randomized testing of the Delta interop surface: a seeded
random walk over DeltaLogWriter's action space (add file / remove file /
grow a deletion vector / purge a DV via re-add / write a checkpoint),
mirrored against a trivially-correct in-memory model of visible rows.
After every commit the reader's snapshot must equal the model; at the end
every historical version must time-travel back exactly.

This catches cross-action interaction bugs (DV x remove, checkpoint x DV,
re-add x stats) that single-feature fixtures miss — the same shape as
tests/test_model_based.py for the vintage store."""

from __future__ import annotations

import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from sdlt_spark.store.delta_dv import write_dv_file
from sdlt_spark.store.delta_read import DeltaTableReader
from sdlt_spark.store.delta_write import DeltaLogWriter

_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
)


def _write_file(root: str, rel: str, keys: list[int]) -> None:
    os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array(keys, pa.int64())}), os.path.join(root, rel)
    )


def _run_walk(spark, tmp_path, seed: int, n_ops: int = 14):
    rng = random.Random(seed)
    root = str(tmp_path / f"dt{seed}")
    os.makedirs(root)
    w = DeltaLogWriter(root)
    next_key = 0
    next_file = 0
    next_uuid = 0

    # model: rel -> (keys in file, deleted positions)
    files: dict[str, tuple[list[int], set[int]]] = {}
    # rel -> live deletionVector descriptor (spec writers name it on the
    # paired remove of every DELETE/OPTIMIZE — readers key on (path, dvId))
    dv_descs: dict[str, dict] = {}
    history: list[list[int]] = []  # visible keys per version

    def _visible() -> list[int]:
        out = []
        for keys, dead in files.values():
            out.extend(k for i, k in enumerate(keys) if i not in dead)
        return sorted(out)

    # v0: initial add
    rel = f"f{next_file}.parquet"
    next_file += 1
    keys = list(range(next_key, next_key + 8))
    next_key += 8
    _write_file(root, rel, keys)
    w.commit(adds=[(rel, {})], schema_json=_SCHEMA)
    files[rel] = (keys, set())
    history.append(_visible())

    r = DeltaTableReader(spark, root)
    for step in range(n_ops):
        live = sorted(files)
        op = rng.choice(["add", "remove", "dv_grow", "dv_purge", "checkpoint"])
        if op == "add" or not live:
            rel = f"f{next_file}.parquet"
            next_file += 1
            n = rng.randrange(1, 7)
            keys = list(range(next_key, next_key + n))
            next_key += n
            _write_file(root, rel, keys)
            w.commit(adds=[(rel, {})])
            files[rel] = (keys, set())
        elif op == "remove":
            rel = rng.choice(live)
            old = dv_descs.pop(rel, None)
            w.commit(removes=[(rel, old)] if old else [rel])
            del files[rel]
        elif op == "dv_grow":
            rel = rng.choice(live)
            keys, dead = files[rel]
            candidates = [i for i in range(len(keys)) if i not in dead]
            if not candidates:
                continue
            extra = set(rng.sample(candidates, rng.randrange(1, len(candidates) + 1)))
            new_dead = dead | extra
            desc = write_dv_file(
                root,
                sorted(new_dead),
                f"00000000-0000-4000-8000-{next_uuid:012d}",
                prefix="dv",
            )
            next_uuid += 1
            # the REAL delta-spark DELETE shape: remove(path, oldDV) paired
            # with add(path, newDV) in one commit
            old = dv_descs.get(rel)
            w.commit(
                adds=[(rel, {})],
                removes=[(rel, old)] if old else [rel],
                dvs={rel: desc},
                operation="DELETE",
            )
            dv_descs[rel] = desc
            files[rel] = (keys, new_dead)
        elif op == "dv_purge":
            rel = rng.choice(live)
            keys, dead = files[rel]
            if not dead:
                continue
            # Delta's REORG: rewrite the file without its deleted rows,
            # re-add it DV-free
            kept = [k for i, k in enumerate(keys) if i not in dead]
            rel2 = f"f{next_file}.parquet"
            next_file += 1
            _write_file(root, rel2, kept)
            old = dv_descs.pop(rel, None)
            w.commit(
                adds=[(rel2, {})],
                removes=[(rel, old)] if old else [rel],
                operation="OPTIMIZE",
            )
            del files[rel]
            files[rel2] = (kept, set())
        else:  # checkpoint
            w.write_checkpoint()
            history.append(None)  # no new version
            history.pop()
        if op == "checkpoint":
            continue
        history.append(_visible())
        got = sorted(x["k"] for x in r.read().collect())
        assert got == _visible(), f"seed={seed} step={step} op={op}"

    # full time-travel audit (checkpoints must not have corrupted replay)
    for v, want in enumerate(history):
        got = sorted(x["k"] for x in r.read(version=v).collect())
        assert got == want, f"seed={seed} time travel v={v}"
    # and the CDF stream of the whole history folds to the final state
    # (insert-count minus delete-count per key == live multiplicity)
    from collections import Counter

    chg = r.table_changes(0)
    net: Counter = Counter()
    for row in chg.collect():
        net[row["k"]] += 1 if row["_change_type"] == "insert" else -1
    final = Counter(_visible())
    assert +net == final, f"seed={seed} CDF fold mismatch"


def test_delta_model_walk_seed1(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=1)


def test_delta_model_walk_seed2(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=2)


def test_delta_model_walk_seed3(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=3)
