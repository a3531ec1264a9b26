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

# The canonical emission types (both sides): the driver hashes results
# through Arrow/pandas, where anything outside this set degrades
# (HUGEINT -> decimal128/float was the round-10 lesson on the oracle
# side; a DecimalType slipping into a Spark dump would be the mirror
# failure) — so BOTH the oracle output and the Spark parquet dump are
# gated, not just compared.
OK_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
            "TIMESTAMP", "INTEGER"}

def odd_types(cols, types):
    return [(c, str(t)) for c, t in zip(cols, types) if str(t) not in OK_TYPES]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            grel = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            # Spark-side emission-type gate (mirror of the oracle one
            # below): a non-canonical column in the dump must fail HERE,
            # before the driver's Arrow/pandas hash path degrades it
            goddt = odd_types(grel.columns, grel.types)
            if goddt:
                print(f"FAIL {name}: non-canonical spark dump types {goddt}")
                n_bad += 1
                continue
            gcols = list(grel.columns)
            grows = grel.fetchall()
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
            oddt = odd_types(rel.columns, rel.types)
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

def selftest():
    """The Spark-dump gate must reject a planted decimal column."""
    import tempfile
    con = duckdb.connect()
    d = tempfile.mkdtemp(prefix="gate_selftest_")
    con.execute(f"""COPY (SELECT CAST(1 AS BIGINT) AS ok_col,
        CAST(1.5 AS DECIMAL(20, 4)) AS planted)
        TO '{d}/part-0.parquet' (FORMAT PARQUET)""")
    rel = con.sql(f"SELECT * FROM parquet_scan('{d}/*.parquet')")
    bad = odd_types(rel.columns, rel.types)
    assert bad and bad[0][0] == "planted", f"gate missed the decimal: {bad}"
    print(f"selftest OK: planted decimal rejected as {bad}")
    return 0

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
