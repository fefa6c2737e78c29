"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf and compares with the
DuckDB oracle: row count, sorted column names, and an order-insensitive
multiset compare of stringified rows. Exit code 1 if anything mismatches.

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from ml_data_pipeline_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def type_category(t: str) -> str:
    """Collapse a Spark simpleString / DuckDB type string into a parity class.

    The driver's correctness hash is typed (Arrow values), so a DuckDB HUGEINT
    (Arrow decimal128) vs Spark bigint is a hash mismatch even when every value
    is numerically identical — the q12_priority_by_status failure class from
    round 3. Known classes: int family, float family, decimal-ish (HUGEINT /
    DECIMAL), string, date, timestamp, bool. Anything else maps to 'other' and
    is skipped (arrays/structs compare by value only).
    """
    u = t.strip().upper()
    if u.startswith("DECIMAL") or u == "HUGEINT" or u == "UHUGEINT":
        return "decimal"
    if u in ("TINYINT", "SMALLINT", "INT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if u in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if u in ("VARCHAR", "STRING", "TEXT"):
        return "string"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u in ("BOOLEAN", "BOOL"):
        return "bool"
    return "other"


def type_parity_problems(scols, stypes, ocols, otypes):
    """Diff Spark vs oracle column types by name; return mismatch strings."""
    smap = {c: type_category(t) for c, t in zip(scols, stypes)}
    omap = {c: type_category(t) for c, t in zip(ocols, otypes)}
    out = []
    for c in smap:
        sc, oc = smap[c], omap.get(c)
        if oc is None or sc == "other" or oc == "other":
            continue
        if sc != oc:
            # int-vs-float is ALSO a driver hash divergence (1 vs 1.0) — fail it.
            out.append(f"type[{c}] spark={sc} oracle={oc}")
    return out


def canon_value(v):
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, float):
        if v != v:
            return "f:nan"
        if v == 0.0:
            v = 0.0  # -0.0 == 0.0 numerically; don't fail on the sign bit
        return f"f:{v:.6f}"
    if isinstance(v, int):
        return f"i:{v}"
    if v is None:
        return "null"
    return "s:" + str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    # pin the PYTHON-side timezone too (r11 review): collect() converts
    # TimestampType via datetime.fromtimestamp in the DRIVER's local tz —
    # spark.sql.session.timeZone=UTC does not govern that — while DuckDB
    # returns the naive stored value, so a non-UTC machine false-FAILs
    # every timestamp-emitting gate
    import os as _os
    import time as _time

    _os.environ["TZ"] = "UTC"
    if hasattr(_time, "tzset"):
        _time.tzset()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # a typo'd filter name must FAIL, not silently verify nothing (r11
    # review: '0 pass, 0 fail' with exit 0 looked green)
    unknown = only - qs.keys()
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    n_pass = n_fail = n_rows_only = 0
    from ml_data_pipeline_spark.cache import release_tracked

    for name, fn in qs.items():
        if only and name not in only:
            continue
        # this sweep IS the long-lived-session shape the tracked-cache
        # registry exists for: the previous query's results are fully
        # materialized, so every operator cache it pinned is reclaimable
        release_tracked()
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            stypes = [f.dataType.simpleString() for f in sdf.schema.fields]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        problems.extend(type_parity_problems(scols, stypes, ocols, otypes))
        if not problems:
            cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
            if cs != co:
                diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    release_tracked()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
