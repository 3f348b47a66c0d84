#!/usr/bin/env python3
"""Driver-faithful pre-flight: compare Verify output vs DuckDB oracles
THROUGH PANDAS, the way the driver does (r04 lesson: fetchall() hides
dtype hazards that pandas exposes — DuckDB HUGEINT -> float64, array
columns -> unhashable numpy.ndarray in sort_values).

Usage: python3 scripts/check_oracle_pandas.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # driver-style: sort rows by all columns, then hash the value grid
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def grid(df):
    out = []
    for row in df.itertuples(index=False):
        out.append(tuple(repr(v) for v in row))
    return out


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        unknown = [q for q in only if q not in oracle]
        if unknown:
            print(f"ERROR: not in oracle set: {unknown}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = canon(con.execute(sql).df())
            sdf = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs "
                  f"oracle {list(odf.columns)}")
            n_fail += 1
            continue
        bad_dtype = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in odf.columns if str(sdf[c].dtype) != str(odf[c].dtype)]
        og, sg = grid(odf), grid(sdf)
        if og != sg:
            diffs = [i for i, (a, b) in enumerate(zip(og, sg)) if a != b]
            msg = (f"row-count {len(sg)} vs {len(og)}" if len(og) != len(sg)
                   else f"{len(diffs)} differing rows, first at {diffs[0]}: "
                        f"spark={sg[diffs[0]]} oracle={og[diffs[0]]}")
            print(f"FAIL {name}: {msg}  dtype-mismatches={bad_dtype}")
            n_fail += 1
            continue
        note = f"  [dtype note: {bad_dtype}]" if bad_dtype else ""
        print(f"PASS {name} ({len(sg)} rows){note}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
