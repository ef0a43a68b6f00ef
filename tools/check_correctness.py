"""Local approximation of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() twin at sf0.01,
compare row count + column names + order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None or v != v:
        return "␀"
    if isinstance(v, float):
        return format(v, ".9g")
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    rows = [
        "\x1f".join(norm_cell(v) for v in rec)
        for rec in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from arcade_spark.session import get_spark

    spark = get_spark(app="correctness-check", cores=8, driver_mem="16g")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(got)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            # Type gate: a projected HUGEINT (DuckDB's type for window /
            # 128-bit SUMs) converts to float64 in .df(), so the driver
            # hashes 1.0 against the engine's bigint 1 and grades the row
            # red even when values agree (the r6 arcade_sessionize bug).
            # Oracles must CAST such columns to BIGINT explicitly.
            hug = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, [str(t) for t in rel.types])
                if t in ("HUGEINT", "UHUGEINT")
            ]
            if hug:
                print(
                    f"FAIL  {name}: oracle projects {hug} — wrap in "
                    "CAST(... AS BIGINT); pandas would coerce to float64 "
                    "and the driver's hash would mismatch"
                )
                failures.append(name)
                continue
            exp = rel.df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ng, cg, hg = frame_hash(got)
        ne, ce, he = frame_hash(exp)
        status = "OK" if (ng, cg, hg) == (ne, ce, he) else "MISMATCH"
        print(f"{status:8s} {name}: spark {ng} rows {hg[:10]} | duckdb {ne} rows {he[:10]}")
        if status != "OK":
            failures.append(name)
            if cg != ce:
                print(f"   cols spark={cg} duckdb={ce}")
            elif ng == ne:
                g = got[sorted(got.columns)].astype(str).sort_values(sorted(got.columns)).head(3)
                e = exp[sorted(exp.columns)].astype(str).sort_values(sorted(exp.columns)).head(3)
                print("   spark sample:\n", g.to_string(), "\n   duckdb sample:\n", e.to_string())
    print("\nFAILED:" if failures else "\nALL OK", failures if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
