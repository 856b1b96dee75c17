#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet result + <out>/oracle_sql.json, runs the
oracle SQL in DuckDB over the sf tables, canonicalizes both sides
(sort columns by name, sort rows, round doubles to 2dp), and reports
match/mismatch per query.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 2)
                    if v == 0:
                        v = 0.0
            rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"FROM '{outdir}/{name}/*.parquet'")
            scols, srows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            duck_rel = con.sql(sql)
            dcols, drows = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            n_bad += 1
        elif srows != drows:
            n_bad += 1
            diff_a = [r for r in srows if r not in set(drows)][:3]
            diff_b = [r for r in drows if r not in set(srows)][:3]
            print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows; "
                  f"spark-only={diff_a} duck-only={diff_b}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(srows)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
