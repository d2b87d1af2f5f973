"""Property test for the rename algebra (r7 verdict #8): three
consecutive rounds each surfaced one more rename edge case
(read-after-rename, append-fold, checkpoint-fold, transitive
union-find), so this pins the WHOLE algebra at once — a seeded random
interleaving of rename / append / merge / update / delete /
checkpoint / compact operations on a tiny table, with the invariant
that every snapshot read equals a naive Python replay of the same
logical-schema operations, at head after every step and via time
travel at sampled historical versions.

Deterministic (fixed seed) so a failure reproduces exactly; 200
operations with state checked after each one = 200+ verified cases
of operation-interleaving prefixes.
"""

from __future__ import annotations

import random
import tempfile

from dss_nlp_ingestion_spark.sources import txlog

N_OPS = 200
KEY_DOMAIN = list(range(10))


def _read_state(spark, path, version=None):
    df = txlog.read(spark, path, version=version)
    cols = list(df.columns)
    rows = {r[0]: tuple(r) for r in df.collect()}
    return cols, rows


def test_rename_algebra_random_interleavings(spark):
    rng = random.Random(0xD55A11)
    path = tempfile.mkdtemp(prefix="dss_renprop_") + "/t"

    def df_of(rows):
        return spark.createDataFrame(
            [(k, v) for k, v in rows], f"k long, {val_col} string"
        )

    # Model: logical value-column name, dict key -> value, and the
    # pool of RETIRED logical names (renaming back onto a previously
    # used name is exactly the transitive-chain territory the r7
    # union-find guard covers).
    val_col = "v"
    retired: list[str] = ["v0"]
    model: dict[int, str] = {0: "a", 1: "b"}
    txlog.create_table(df_of(sorted(model.items())), path, stats_cols=["k"])
    # version -> (expected columns, expected rows) for time travel.
    snapshots: dict[int, tuple[list[str], dict[int, tuple]]] = {}

    def snap():
        head = txlog.history(path)[-1]["version"]
        snapshots[head] = (
            ["k", val_col],
            {k: (k, v) for k, v in model.items()},
        )

    snap()
    ops = ("rename", "rename", "rename", "append", "append", "merge",
           "update", "delete", "checkpoint", "compact")
    for step in range(N_OPS):
        op = rng.choice(ops)
        if op == "rename":
            # Fresh name half the time, a RECYCLED retired name the
            # other half (chain folding must never resurrect it).
            if retired and rng.random() < 0.5:
                new = retired.pop(rng.randrange(len(retired)))
            else:
                new = f"v{step}_{rng.randrange(100)}"
            retired.append(val_col)
            txlog.rename_column(path, val_col, new)
            val_col = new
        elif op == "append":
            new_keys = [k for k in KEY_DOMAIN if k not in model]
            if not new_keys:
                continue
            rows = [
                (k, f"s{step}")
                for k in rng.sample(new_keys, min(len(new_keys), 2))
            ]
            txlog.append(df_of(rows), path, stats_cols=["k"])
            model.update(dict(rows))
        elif op == "merge":
            rows = [
                (k, f"m{step}")
                for k in rng.sample(KEY_DOMAIN, rng.randrange(1, 4))
            ]
            txlog.merge_into_table(
                spark, path, df_of(rows), ["k"], stats_cols=["k"]
            )
            model.update(dict(rows))
        elif op == "update":
            if not model:
                continue
            k = rng.choice(sorted(model))
            txlog.update_table(
                spark, path, f"k = {k}", {val_col: f"'u{step}'"},
                stats_cols=["k"],
            )
            model[k] = f"u{step}"
        elif op == "delete":
            if len(model) <= 1:
                continue
            k = rng.choice(sorted(model))
            txlog.delete_from_table(
                spark, path, f"k = {k}", stats_cols=["k"]
            )
            del model[k]
        elif op == "checkpoint":
            txlog.checkpoint_log(path)
            continue  # no new data version; head snapshot unchanged
        elif op == "compact":
            txlog.compact(spark, path)
        snap()
        cols, rows = _read_state(spark, path)
        assert cols == ["k", val_col], f"step {step} ({op}): {cols}"
        assert rows == snapshots[txlog.history(path)[-1]["version"]][1], (
            f"step {step} ({op}): head read != replay model"
        )

    # Time travel: sampled historical versions must match the replay
    # model AS OF that version — the rename chain must resolve to the
    # names and rows of the PAST snapshot, not the present one.
    versions = sorted(snapshots)
    for v in rng.sample(versions, min(15, len(versions))):
        exp_cols, exp_rows = snapshots[v]
        cols, rows = _read_state(spark, path, version=v)
        assert cols == exp_cols, f"version {v}: {cols} != {exp_cols}"
        assert rows == exp_rows, f"version {v}: rows diverge from replay"
