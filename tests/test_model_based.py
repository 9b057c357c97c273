"""Model-based randomized testing of VintageTable: a seeded random walk
over the full mutation surface (overwrite/append/merge/delete[cow|dv]/
update/compact/optimize/restore/vacuum/checkpoint), mirrored against a
trivially-correct in-memory multiset model. After EVERY op the snapshot
must equal the model; periodically, time travel must reproduce recorded
history states and diff(v1, v2) folded onto model(v1) must yield model(v2).

This is the storage-engine test shape that catches cross-op interaction
bugs no single-feature test does (e.g. the round-4 DV x overwrite CDC bug
was exactly such an interaction)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sdlt_spark.store.vintage import VintageTable

COLS = ["k", "grp", "v"]


def _mk_rows(rng: random.Random, n: int, key_hi: int) -> list[tuple[int, int, float]]:
    # duplicate keys on purpose: the table is NOT keyed outside merge, and
    # merge must collapse multi-row keys exactly like the model does
    return [
        (rng.randrange(key_hi), rng.randrange(5), float(rng.randrange(100)))
        for _ in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, grp long, v double")


def _snapshot(t: VintageTable, version=None) -> list[tuple]:
    return sorted(
        (r["k"], r["grp"], r["v"]) for r in t.read(version=version).collect()
    )


def _check(t, model, ctx):
    got = _snapshot(t)
    want = sorted(model)
    assert got == want, f"{ctx}: table={got[:6]}...({len(got)}) model={want[:6]}...({len(want)})"


def _run_walk(spark, tmp_path, seed: int, n_ops: int = 18):
    rng = random.Random(seed)
    t = VintageTable(spark, str(tmp_path / f"t{seed}"))
    model: list[tuple] = _mk_rows(rng, 30, 40)
    t.write(_df(spark, model).repartition(3))
    history = {t.latest_version(): list(model)}
    _check(t, model, "initial write")

    for step in range(n_ops):
        op = rng.choice(
            ["append", "merge", "delete", "delete_dv", "update", "update_dv",
             "compact", "optimize", "restore", "vacuum", "checkpoint", "overwrite"]
        )
        ctx = f"seed={seed} step={step} op={op}"
        if op == "overwrite":
            model = _mk_rows(rng, rng.randrange(10, 40), 40)
            t.write(_df(spark, model).repartition(2))
        elif op == "append":
            rows = _mk_rows(rng, rng.randrange(1, 12), 40)
            t.write(_df(spark, rows), mode="append")
            model = model + rows
        elif op == "merge":
            # unique source keys (duplicate source keys raise, like Delta);
            # merge removes EVERY target row of a matched key
            keys = rng.sample(range(60), rng.randrange(1, 8))
            src = [(k, rng.randrange(5), float(rng.randrange(100, 200))) for k in keys]
            t.merge(_df(spark, src), ["k"])
            kept = [r for r in model if r[0] not in set(keys)]
            model = kept + src
        elif op in ("delete", "delete_dv"):
            g = rng.randrange(5)
            t.delete(f"grp = {g}", mode="dv" if op == "delete_dv" else "copy_on_write")
            model = [r for r in model if r[1] != g]
        elif op in ("update", "update_dv"):
            g = rng.randrange(5)
            c = float(rng.randrange(1000))
            t.update(
                f"grp = {g}", {"v": F.lit(c)},
                mode="dv" if op == "update_dv" else "copy_on_write",
            )
            model = [(k, grp, c if grp == g else v) for (k, grp, v) in model]
        elif op == "compact":
            t.compact(num_files=rng.randrange(1, 4))
        elif op == "optimize":
            t.optimize(target_file_bytes=1 << 20)
        elif op == "restore":
            target = rng.choice(sorted(history))
            t.restore(version=target)
            model = list(history[target])
        elif op == "vacuum":
            # zero-retention vacuum must never touch live data, only
            # invalidate time travel (prune history the model tracks)
            t.vacuum(retention_hours=0)
            history = {t.latest_version(): list(model)}
        elif op == "checkpoint":
            t.checkpoint()
        history[t.latest_version()] = list(model)
        _check(t, model, ctx)

    # time travel reproduces every recorded state still within retention
    for v, snap in history.items():
        assert _snapshot(t, version=v) == sorted(snap), f"seed={seed} travel v{v}"

    # diff(v1, v2) folded onto model(v1) == model(v2), multiset semantics
    versions = sorted(history)
    if len(versions) >= 2:
        v1, v2 = versions[0], versions[-1]
        folded = list(history[v1])
        for r in t.diff(v1, v2).collect():
            row = (r["k"], r["grp"], r["v"])
            if r["_change_type"] == "insert":
                folded.append(row)
            else:
                folded.remove(row)  # raises if diff over-reports a delete
        assert sorted(folded) == sorted(history[v2]), f"seed={seed} diff fold"


def test_model_walk_seed_1(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=1)


def test_model_walk_seed_2(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=2)


def test_model_walk_clone_isolation(spark, tmp_path):
    """Clone mid-walk: the clone equals the source at clone time, diverges
    independently, and the source never changes (round-5 contract)."""
    rng = random.Random(7)
    t = VintageTable(spark, str(tmp_path / "src"))
    model = _mk_rows(rng, 25, 30)
    t.write(_df(spark, model).repartition(2))
    t.delete("grp = 2", mode="dv")  # live DVs ride into the clone translated
    model = [r for r in model if r[1] != 2]
    src_versions = t._commit_versions()

    c = t.clone(str(tmp_path / "cl"))
    assert t._commit_versions() == src_versions
    clone_model = list(model)
    _check(c, clone_model, "clone bootstrap")

    c.update("grp = 1", {"v": F.lit(-5.0)})
    clone_model = [(k, g, -5.0 if g == 1 else v) for (k, g, v) in clone_model]
    c.delete("grp = 0")
    clone_model = [r for r in clone_model if r[1] != 0]
    _check(c, clone_model, "clone mutations")
    _check(t, model, "source untouched by clone mutations")
