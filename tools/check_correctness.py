#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column-name set, and an order-insensitive
value multiset (floats canonicalized).  Usage:

    python tools/check_correctness.py [--json OUT] [--all] [sf_dir] [query ...]

No query names (or ``--all``) runs the FULL registry; ``--json OUT``
writes the machine-readable receipt (per-query status/rows/seconds
plus the summary counts) — the full-registry strict receipt the
round records as ``STRICT_r{N}.json`` (r10 verdict ask #2).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

#: set XYZPY_STRICT=1 to compare floats at full precision (closer to the
#: driver's strict value-hash than the default 9-sig-fig canon)
STRICT = os.environ.get("XYZPY_STRICT", "") not in ("", "0")

import __spark_entry__ as entrymod
from xyzpy_spark.session import get_spark


#: DuckDB result types the driver's type-sensitive value hash cannot
#: canonicalize against Spark's (int128s, unsigned ints, decimals).  An
#: oracle whose output schema contains any of these is a FAIL *before*
#: value comparison — round 7 proved bit-exact values still hash red
#: when the oracle types SUM(BIGINT) as HUGEINT.
import re

_BANNED_ORACLE_TYPES = re.compile(
    r"\b(HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|DECIMAL)\b"
)


def audit_oracle_types(con, sql):
    """Return [(column, type)] oracle output columns whose DuckDB type
    the driver's hash cannot match (HUGEINT/unsigned/DECIMAL, incl.
    nested inside LIST/STRUCT).  Empty list = clean."""
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if _BANNED_ORACLE_TYPES.search(str(t))
    ]


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if STRICT:
            # bit-exact mode: mimic the driver's strict value hash
            return repr(v)
        # canonical float: kill last-ulp noise surviving the ROUNDs
        return f"{v:.9g}"
    if isinstance(v, int):
        return v
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    try:  # decimals
        import decimal

        if isinstance(v, decimal.Decimal):
            return canon(float(v))
    except ImportError:
        pass
    if hasattr(v, "asDict"):  # Row / struct
        return tuple(sorted((k, canon(x)) for k, x in v.asDict().items()))
    return v


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--all" in args:  # explicit alias for the no-names default
        args = [a for a in args if a != "--all"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="correctness_check")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    record = {}
    for name, qfn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qfn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            record[name] = {"status": "fail",
                            "detail": f"spark error: {exc}"[:300]}
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(srows) >= 0
            print(f"weak  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            record[name] = {"status": "rows_only", "rows": len(srows),
                            "seconds": round(time.time() - t0, 2)}
            n_weak += 1
            continue
        try:
            bad_types = audit_oracle_types(con, oracles[name])
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            record[name] = {"status": "fail",
                            "detail": f"oracle error: {exc}"[:300]}
            n_fail += 1
            continue
        problems = []
        if bad_types:
            problems.append(
                "oracle output types the driver hash rejects "
                f"(CAST them): {bad_types}"
            )
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            s_norm = normalize(srows, scols)
            o_norm = normalize(orows, ocols)
            if s_norm != o_norm:
                diffs = [
                    (a, b) for a, b in zip(s_norm, o_norm) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            record[name] = {"status": "fail",
                            "detail": "; ".join(problems)[:300]}
            n_fail += 1
        else:
            print(f"pass  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            record[name] = {"status": "pass", "rows": len(srows),
                            "seconds": round(time.time() - t0, 2)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} FAIL")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "strict": STRICT,
                    "n_pass": n_pass,
                    "n_rows_only": n_weak,
                    "n_fail": n_fail,
                    "queries": record,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
