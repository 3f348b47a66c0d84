#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB correctness gate.

NOT part of the library. Mimics what the driver does with Verify output:
for each query, run the oracle SQL in DuckDB over the same sf parquet
tables, read the Spark result parquet, sort columns by name, sort rows,
and compare values exactly.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]
(optional query names restrict the compare — e.g. the slow brute-force
LSH oracles when confirming at sf0.1)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        unknown = [q for q in only if q not in oracle]
        if unknown:  # fail loudly: a typo must not yield "0 pass, 0 fail"
            print(f"ERROR: not in oracle set: {unknown}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            cur2 = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in cur2.description]
            srows = cur2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        oc, orws = canon(ocols, orows)
        sc, srws = canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: columns oracle={oc} spark={sc}")
            n_fail += 1
            continue
        if len(orws) != len(srws):
            print(f"FAIL {name}: rows oracle={len(orws)} spark={len(srws)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orws, srws)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orws)} rows differ; "
                  f"first at {i}:\n  oracle={a}\n  spark ={b}\n  cols={oc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orws)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
