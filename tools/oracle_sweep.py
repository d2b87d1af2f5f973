"""Full-registry oracle sweep at an arbitrary SF (driver-gate mirror).

Usage: python tools/oracle_sweep.py [sf_dir] [name_prefix...]

Runs every registered query through Spark AND its DuckDB oracle on the
given scale factor and prints one line per mismatch (plus a final
summary). This is the same order-insensitive compare the pytest gate
uses at sf0.001, but pointable at sf0.01/sf0.1 where data-dependent
divergence (frame-peer ties, same-second pairs, hash collisions) can
hide at tiny SF.
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from dss_nlp_ingestion_spark.plans import ORACLES, QUERIES  # noqa: E402
from dss_nlp_ingestion_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]
    spark = get_spark(app_name="oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    names = sorted(ORACLES)
    if prefixes:
        names = [n for n in names if any(n.startswith(p) for p in prefixes)]
    bad = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = duck.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            status = "ok"
            if sorted(scols) != sorted(dcols):
                status = f"COLS spark={sorted(scols)} duck={sorted(dcols)}"
            else:
                _, s_norm = _normalize(scols, srows)
                _, d_norm = _normalize(dcols, drows)
                if len(s_norm) != len(d_norm):
                    status = f"ROWS spark={len(s_norm)} duck={len(d_norm)}"
                else:
                    mm = [
                        (j, a, b)
                        for j, (a, b) in enumerate(zip(s_norm, d_norm))
                        if a != b
                    ]
                    if mm:
                        status = f"HASH {len(mm)} rows; first: {mm[0]}"[:400]
        except Exception as exc:  # noqa: BLE001
            status = f"ERR {type(exc).__name__}: {exc}"[:400]
            traceback.print_exc(limit=3)
        dt = time.perf_counter() - t0
        if status != "ok":
            bad.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)
    print(f"SWEEP DONE sf_dir={sf_dir} bad={len(bad)} {bad}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
