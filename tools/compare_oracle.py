"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry in Spark and its ``oracle_sql()`` twin in DuckDB at
sf0.01, compare row-count + (name-sorted) schema + order-insensitive
canonical values. Stricter than a hash compare: prints the first
mismatching rows.

Usage: python tools/compare_oracle.py [sf_dir] [--twice] [query ...]

``--twice`` re-builds and re-collects every Spark result and fails on
any run-to-run drift (the driver's hash compare would too).
``SPARK_GRAFT_VANILLA=1`` swaps in a bare SparkSession.builder session
— the DRIVER's exact configuration — instead of the engine's
get_spark().
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pdf_using_hugging_face_and_vector_database_spark.schemas import TESTDATA_TABLES
from pdf_using_hugging_face_and_vector_database_spark.session import get_spark


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return v
    if isinstance(v, (bytes, bytearray, memoryview)):
        # Spark hands binary cells back as bytearray, which is
        # UNHASHABLE — without this branch a binary output column
        # crashes the Counter compare with a TypeError instead of
        # comparing (r13 review wave 5; latent — no registered query
        # outputs binary today, but the gate must not be the thing
        # that breaks first when one does)
        return bytes(v).hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def spark_rows(df):
    # The DRIVER's comparator canonicalizes through pandas sort_values,
    # which cannot factorize list/dict cells: an array/map/struct
    # OUTPUT column is a guaranteed driver error even when values are
    # right (round 5's snapshot_diff red row). Reject it here so the
    # gate catches the schema class, not just the values.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if complex_cols:
        raise ValueError(
            "driver-unsortable complex-typed output column(s): "
            f"{complex_cols} — serialize them (e.g. array_join) at the "
            "query surface"
        )
    cols = sorted(df.columns)
    return cols, [tuple(canon(r[c]) for c in cols) for r in df.collect()]


def duck_rows(con, sql):
    res = con.sql(sql)
    names = res.columns
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, [tuple(canon(row[i]) for i in order) for row in res.fetchall()]


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    twice = "--twice" in args and (args.remove("--twice") or True)
    only = set(args)

    # fail fast on names the registry does not know — BEFORE the JVM
    # spins up. Previously a typo'd sweep (`compare_oracle.py sfdir
    # pit_boundry_ties`) matched nothing, printed "0 pass, 0 fail" and
    # exited 0: a green receipt that verified NOTHING (r13 review
    # wave 5 — the measurement-harness class the r12 replica-fidelity
    # finding pointed at).
    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # replicate the DRIVER's session exactly: a vanilla builder
        # with none of the engine's config (catches config-dependent
        # bugs — e.g. nanosAsLong — before they cost a driver slot)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
            )
            .appName("compare_oracle_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            scols, srows = spark_rows(fn(spark, sf_dir))
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if twice:
            # determinism gate: a second build+collect must produce
            # the identical multiset — a query that drifts between
            # runs would hash-mismatch at the driver even with a
            # correct oracle
            import collections as _c

            scols2, srows2 = spark_rows(fn(spark, sf_dir))
            if scols2 != scols or _c.Counter(srows2) != _c.Counter(srows):
                print(f"FAIL {name}: NONDETERMINISTIC between runs")
                n_fail += 1
                continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dcols, drows = duck_rows(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if scols != dcols:
            print(f"FAIL {name}: columns differ\n  spark={scols}\n  duck ={dcols}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: row count {len(srows)} vs {len(drows)}")
            ok = False
        else:
            import collections

            sc, dc = collections.Counter(srows), collections.Counter(drows)
            if sc != dc:
                only_s = list((sc - dc).elements())[:3]
                only_d = list((dc - sc).elements())[:3]
                print(f"FAIL {name}: values differ")
                for r in only_s:
                    print(f"  spark-only: {r}")
                for r in only_d:
                    print(f"  duck-only : {r}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
