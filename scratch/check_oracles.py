"""Driver-sim: run each queries() entry on Spark AND its oracle_sql() on
DuckDB at sf0.01; compare row count, sorted-by-name schema, and
order-insensitive values."""
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return f"{v:.10g}"
    if v is None:
        return "NULL"
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


def main():
    import __spark_entry__ as E
    from helix_html2md_spark.session import build_session

    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        sdf = fn(spark, SF)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d}  (no oracle - rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        s, d = rowset(scols, srows), rowset(dcols, drows)
        ok_vals = s == d
        status = "OK" if ok_schema and ok_vals else "MISMATCH"
        print(
            f"{name:24s} rows={len(srows):6d}/{len(drows):6d} "
            f"schema={'ok' if ok_schema else sorted(scols)} vals={'ok' if ok_vals else 'DIFF'} {status}"
        )
        if not ok_schema:
            print("   spark:", sorted(scols), " duck:", sorted(dcols))
            failures += 1
        elif not ok_vals:
            failures += 1
            for a, b in list(zip(s, d))[:200]:
                if a != b:
                    print("   spark:", a)
                    print("   duck :", b)
                    break
            only_s = [r for r in s if r not in set(map(tuple, d))][:2]
            only_d = [r for r in d if r not in set(map(tuple, s))][:2]
            if only_s:
                print("   only-spark:", only_s)
            if only_d:
                print("   only-duck :", only_d)
    print("FAILURES:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
