"""Round-6 equivalence guard: snapshot every declared query's exact
output rows, then diff after each optimization.

A query whose optimized plan produces byte-identical rows to the
pre-optimization snapshot is oracle-equivalent by transitivity (the
snapshot passed the driver's DuckDB oracle in round 5 and the oracle
SQL is frozen).

Usage:
    python scratch/snap_r06.py snap /root/testdata/sf0.01 baseline
    python scratch/snap_r06.py diff /root/testdata/sf0.01 baseline [q1,q2]
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAP_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "snaps")


def canon(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return [canon(x) for x in v]
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "asDict"):
        return {k: canon(x) for k, x in v.asDict().items()}
    return v


def rows_of(df):
    return {
        "schema": df.schema.simpleString(),
        "rows": [[canon(v) for v in r] for r in df.collect()],
    }


def main():
    mode, sf_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    import __spark_entry__ as E
    from helix_html2md_spark.operators.dedup import release_persisted
    from helix_html2md_spark.session import build_session

    spark = build_session("snap-r06", master="local[32]",
                          shuffle_partitions=32)
    safe = sf_dir.strip("/").replace("/", "_")
    out_dir = os.path.join(SNAP_ROOT, f"{tag}_{safe}")
    os.makedirs(out_dir, exist_ok=True)

    failures = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}.json")
        try:
            got = rows_of(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: {e}", flush=True)
            failures.append(name)
            release_persisted()
            continue
        release_persisted()
        if mode == "snap":
            with open(path, "w") as fh:
                json.dump(got, fh)
            print(f"snap   {name}: {len(got['rows'])} rows", flush=True)
        else:
            with open(path) as fh:
                want = json.load(fh)
            if got == want:
                print(f"OK     {name}: {len(got['rows'])} rows", flush=True)
            else:
                failures.append(name)
                msg = ""
                if got["schema"] != want["schema"]:
                    msg = f" schema {want['schema']!r} -> {got['schema']!r}"
                elif len(got["rows"]) != len(want["rows"]):
                    msg = f" nrows {len(want['rows'])} -> {len(got['rows'])}"
                else:
                    for i, (a, b) in enumerate(zip(want["rows"], got["rows"])):
                        if a != b:
                            msg = f" first diff row {i}: {a} -> {b}"
                            break
                print(f"DIFF   {name}:{msg}", flush=True)
    spark.stop()
    if failures:
        print("FAILURES: " + ",".join(failures))
        sys.exit(1)
    print("ALL MATCH" if mode == "diff" else "SNAPSHOT DONE")


if __name__ == "__main__":
    main()
