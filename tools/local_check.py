#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
dumps produced by `graft.Verify`, runs each oracle SQL from
oracle_sql.json in DuckDB over the same sf dir, and compares row
multisets (columns sorted by name, rows sorted, doubles rounded)."""
import json, math, sys
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
                if math.isnan(v): v = "NaN"
                else: v = round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_bad += 1; continue
        try:
            # Emission-type gate: the driver hashes DuckDB output through
            # Arrow/pandas, where HUGEINT (an uncast sum(BIGINT)) becomes
            # decimal128/float and hash-mismatches Spark's long even when
            # every value is equal (the round-10 lesson: exactly the six
            # rows emitting HUGEINT failed the driver while local
            # fetchall() masked it). Flag any non-canonical output type.
            # one relation serves both the type gate and the row fetch
            # (con.execute(sql) after con.sql(sql) would materialize the
            # query twice, doubling DuckDB time for the 301-row gate)
            rel = con.sql(sql)
            okt = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
                   "TIMESTAMP", "INTEGER"}
            oddt = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                    if str(t) not in okt]
            if oddt:
                print(f"FAIL {name}: non-canonical oracle output types {oddt}")
                n_bad += 1
                continue
            ecols = list(rel.columns)
            erows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e).splitlines()[0]}"); n_bad += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} duck={sorted(ecols)}"); n_bad += 1; continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}"); n_bad += 1; continue
        if g != e:
            diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"FAIL {name}: {len([1 for a,b in zip(g,e) if a!=b])} differing rows; first at {diff}")
            for i in diff[:2]:
                print(f"   spark: {g[i]}\n   duck : {e[i]}")
            n_bad += 1; continue
        print(f"OK   {name}: {len(g)} rows")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
