#!/usr/bin/env python3
"""Local stand-in for the grading driver's correctness gate:
runs after `sbt "runMain graft.Verify <sfdir> <outdir>"`:
for each query parquet in <outdir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compares
(rows, schema-ish, values) after sorting columns by name and rows by value.

Usage: python3 tools/check_oracle.py <sfdir> <outdir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)

def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x01".join(norm_cell(r[i]) for i in order))
    out.sort()
    return out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols, grows = [d[0] for d in got.description], got.fetchall()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(grows)}" + (" EMPTY!" if not grows else "")
            continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = [d[0] for d in exp.description], exp.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        if sorted(gcols) != sorted(ecols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(gcols)} duck={sorted(ecols)}"
            continue
        if len(grows) != len(erows):
            results[name] = f"ROWCOUNT spark={len(grows)} duck={len(erows)}"
            continue
        gk, ek = frame_key(grows, gcols), frame_key(erows, ecols)
        if gk == ek:
            results[name] = f"OK rows={len(grows)}"
        else:
            diffs = [(a, b) for a, b in zip(gk, ek) if a != b][:3]
            results[name] = f"VALUE_MISMATCH e.g. {diffs}"
    bad = 0
    for k, v in sorted(results.items()):
        flag = "✔" if v.startswith("OK") or v.startswith("ROWS_ONLY rows=") and "EMPTY" not in v else "✘"
        if flag == "✘":
            bad += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
