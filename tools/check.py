"""Driver-mimic correctness harness: Spark query vs DuckDB oracle.

Runs every registered query both ways at a given sf_dir, canonicalizes
(sort columns by name, round floats, stringify), and compares row count,
schema shape, and an order-insensitive value hash — approximating the
driver's CORRECTNESS_r{N}.json gate so regressions surface locally.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from cassandra_extractor_spark.session import get_spark
    from cassandra_extractor_spark.sources.catalog import TABLES

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{spark_s:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            continue
        sn, sh = canon_hash(scols, srows)
        on, oh = canon_hash(ocols, orows)
        ok = sn == on and sh == oh and sorted(scols) == sorted(ocols)
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status} {name}: spark {sn} rows h={sh} | oracle {on} rows h={oh} [{spark_s:.1f}s]")
        if not ok and sorted(scols) != sorted(ocols):
            print(f"  cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not ok and sn == on and sorted(scols) == sorted(ocols):
            # show first differing canonical line
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ls = sorted("\x1f".join(canon_cell(r[i]) for i in order_s) for r in srows)
            lo = sorted("\x1f".join(canon_cell(r[i]) for i in order_o) for r in orows)
            for a, b in zip(ls, lo):
                if a != b:
                    print(f"  spark : {a[:200]}")
                    print(f"  oracle: {b[:200]}")
                    break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
