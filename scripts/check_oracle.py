#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: read Verify's
parquet dumps + oracle_sql.json, run each oracle in DuckDB over the
same sf dir, and compare row counts, schemas, and sorted values.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query...]
(Dev tool only — the shipped Scala library never depends on this.)
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows; stringify for stable compare
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
            scols, stypes = spark_rel.columns, [str(t) for t in spark_rel.types]
            srows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            dcols, dtypes = duck_rel.columns, [str(t) for t in duck_rel.types]
            drows = duck_rel.fetchall()
        except Exception as e:
            results[name] = f"ERROR: {str(e)[:200]}"
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            smap = dict(zip(scols, stypes)); dmap = dict(zip(dcols, dtypes))
            tmis = {c: (smap[c], dmap[c]) for c in smap if smap[c] != dmap[c]}
            if tmis:
                problems.append(f"types {tmis}")
        if len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duck={len(drows)}")
        if not problems:
            sc = canon(srows, scols)
            dc = canon(drows, dcols)
            if sc != dc:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ, first={diff}")
        results[name] = "OK" if not problems else "; ".join(problems)
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        mark = "PASS" if v == "OK" else "FAIL"
        print(f"{mark} {name}: {v}")
    print(f"\n{ok}/{len(results)} PASS")

if __name__ == "__main__":
    main()
