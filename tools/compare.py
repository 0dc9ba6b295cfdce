#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Runs Verify output (parquet per query) against SparkEntry.oracleSql
executed in DuckDB over the same testdata tables; compares sorted-by-name
columns, row counts, and value hashes. Usage:
    python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    import math, decimal, datetime
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        rel = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        mine_cols = [c[0] for c in rel.description]
        mine = rel.fetchall()
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(mine),
                             "ok": len(mine) > 0}
            continue
        try:
            orel = con.execute(oracle[name])
            ocols = [c[0] for c in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:300]}
            continue
        schema_ok = sorted(mine_cols) == sorted(ocols)
        rows_ok = len(mine) == len(orows)
        h1 = table_hash(mine, mine_cols)
        h2 = table_hash(orows, ocols)
        results[name] = {"status": "compared", "schema": schema_ok,
                         "rows": rows_ok, "hash": h1 == h2,
                         "n_mine": len(mine), "n_oracle": len(orows),
                         "mine_cols": sorted(mine_cols),
                         "oracle_cols": sorted(ocols)}
        if h1 != h2 and schema_ok and rows_ok:
            # show first diffs
            order_m = sorted(range(len(mine_cols)), key=lambda i: mine_cols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sm = sorted("|".join(canon(r[i]) for i in order_m) for r in mine)
            so = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
            diffs = [(a, b) for a, b in zip(sm, so) if a != b][:3]
            results[name]["first_diffs"] = diffs
    ok = all(r.get("hash") or r.get("ok") for r in results.values())
    print(json.dumps(results, indent=1, default=str))
    print("ALL OK" if ok else "FAILURES PRESENT")

if __name__ == "__main__":
    main()
