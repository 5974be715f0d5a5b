#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Registers each <sfDir>/<table>.parquet as a DuckDB view, runs every oracle
SQL from <verifyOutDir>/oracle_sql.json, loads the corresponding Spark
result parquet, sorts columns by name and rows by value, and compares.
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # stable text form; exact doubles compare exactly
                v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        try:
            sres = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failed.append(name)
            continue
        oc, orws = canon(orows, ocols)
        sc, srws = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: schema {sc} != oracle {oc}")
            failed.append(name)
        elif orws != srws:
            print(f"FAIL {name}: rows spark={len(srws)} oracle={len(orws)}")
            for a, b in list(zip(srws, orws))[:5]:
                if a != b:
                    print(f"   spark  {a}\n   oracle {b}")
            if len(srws) != len(orws):
                so, oo = set(srws), set(orws)
                print(f"   only-spark  {list(so - oo)[:3]}")
                print(f"   only-oracle {list(oo - so)[:3]}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(srws)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
