#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
written by graft.Verify, run the matching DuckDB oracle SQL over the same
parquet tables and compare values (columns sorted by name, rows sorted).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if v is None:
        return "NULL"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            duck = con.sql(sql)
            dcols = sorted(duck.columns)
            drows = con.sql(
                f"SELECT {', '.join(dcols)} FROM duck ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols = sorted(spark_rel.columns)
            srows = con.sql(
                f"SELECT {', '.join(scols)} FROM spark_rel ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result read error: {e}")
            n_fail += 1
            continue
        if dcols != scols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            n_fail += 1
            continue
        # type-CLASS check: the driver's gate hashes typed values, and a
        # representation-changing divergence — DuckDB HUGEINT (serialized
        # like a decimal) vs Spark BIGINT — fails there even when
        # stringified values match (round-1 q07/q12 lesson). Plain integer
        # widths (INT vs BIGINT) are equivalent in the driver gate, so only
        # class-level differences are flagged.
        def tclass(t):
            t = str(t)
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t  # HUGEINT, DECIMAL(...), VARCHAR, ... stay distinct
        dtypes = dict(zip(
            con.sql(f"SELECT {', '.join(dcols)} FROM duck").columns,
            [tclass(t) for t in con.sql(f"SELECT {', '.join(dcols)} FROM duck").types]))
        stypes = dict(zip(
            con.sql(f"SELECT {', '.join(scols)} FROM spark_rel").columns,
            [tclass(t) for t in con.sql(f"SELECT {', '.join(scols)} FROM spark_rel").types]))
        mismatched = {c: (stypes[c], dtypes[c]) for c in scols
                      if stypes[c] != dtypes[c]}
        if mismatched:
            print(f"FAIL {name}: column type classes differ (spark, duck): {mismatched}")
            n_fail += 1
            continue
        sn = [[norm(v) for v in r] for r in srows]
        dn = [[norm(v) for v in r] for r in drows]
        if sn == dn:
            print(f"PASS {name}: {len(sn)} rows")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(sn)} duck={len(dn)}")
            shown = 0
            for i in range(max(len(sn), len(dn))):
                a = sn[i] if i < len(sn) else None
                b = dn[i] if i < len(dn) else None
                if a != b:
                    print(f"  row {i}: spark={a}")
                    print(f"         duck ={b}")
                    shown += 1
                    if shown >= 3:
                        break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
