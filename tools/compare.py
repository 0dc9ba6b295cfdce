#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Round-1 lesson: the driver reads OUR parquet via pandas/pyarrow (decimals
stay `Decimal('x.4300')`, keeping scale) but fetches the oracle via duckdb
`.df()` (DECIMAL -> float64, HUGEINT -> float64), then hashes `str()` of
each cell.  A single canonicalization path therefore produces false
greens: round 1 passed locally (fetchall both sides) while the driver
flagged 10 hash mismatches on every query that emitted decimal128 or an
integer SUM (DuckDB SUM(int) is HUGEINT -> "56.0" vs "56").

This emulator now requires a match under ALL of these paths, so a query
only passes if its output types are representation-invariant:

  path A ("driver-observed"): mine via pyarrow->pandas, oracle via
          duckdb .df(), canon = str(cell)
  path B: both sides via duckdb fetchall, strict canon
          (str(Decimal) keeps scale, datetime.isoformat, repr(float))

House rule that falls out: queries may emit only BIGINT/INT, DOUBLE
(bit-identical in both engines), STRING, BOOLEAN, and naive timestamps.
Never decimal128, never a bare DuckDB SUM(int) (cast to BIGINT).

Usage:  python3 tools/compare.py <sfDir> <verifyOutDir> [--memo-pairs]

--memo-pairs (OPT-IN, local evidence runs only — never the gate
emulation): six oracles embed the identical all-pairs shingle-Jaccard
CTE, a 12.5M-comparison cartesian with per-pair list_intersect at
sf0.1 that dominates the ~4h compare wall (BASELINE.md round-8 note).
With the flag, the shingle table and the unfiltered >= 0.5 pair table
are materialized ONCE and the known fragment texts are rewritten to
read them; a fragment that no longer matches byte-for-byte is simply
left alone (the slow, faithful path), so oracle drift can never be
masked by a stale rewrite.  pipeline_hygiene's clean-filtered pair set
rewrites to the unfiltered pairs restricted to clean ids — equivalent
because its Jaccard predicate is conjunctive with the id filters.
Independent of the flag, byte-identical whole-oracle texts (the
components pair, the range join/TVF pair) are materialized once and
reused — same SQL, same engine, same result by definition.
"""
import sys, json, glob, os, hashlib, math, decimal, datetime
from collections import Counter
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# --memo-pairs fragment texts, byte-for-byte as PipelineQueries.scala
# emits them into oracle_sql.json (two wrap variants of the pair CTE).
SH_BODY = (
    "  SELECT doc_id,\n"
    "    list_distinct([lst[i]||' '||lst[i+1]||' '||lst[i+2]\n"
    "                   FOR i IN range(1, len(lst)-1)]) AS sh\n"
    "  FROM (SELECT doc_id, regexp_split_to_array(trim(text),'\\s+') AS lst\n"
    "        FROM documents)")
PAIRS_V1 = (
    "  SELECT a.doc_id AS id_a, b.doc_id AS id_b\n"
    "  FROM sh a, sh b WHERE a.doc_id < b.doc_id\n"
    "    AND CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE) /\n"
    "        CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))"
    " AS DOUBLE) >= 0.5")
PAIRS_V2 = (
    "  SELECT a.doc_id AS id_a, b.doc_id AS id_b\n"
    "  FROM sh a, sh b WHERE a.doc_id < b.doc_id\n"
    "    AND CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE) /\n"
    "        CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))\n"
    "             AS DOUBLE) >= 0.5")
PAIRS_HYG = (
    "  SELECT a.doc_id AS id_a, b2.doc_id AS id_b\n"
    "  FROM sh a, sh b2 WHERE a.doc_id < b2.doc_id\n"
    "    AND a.doc_id IN (SELECT doc_id FROM clean)\n"
    "    AND b2.doc_id IN (SELECT doc_id FROM clean)\n"
    "    AND CAST(len(list_intersect(a.sh,b2.sh)) AS DOUBLE) /\n"
    "        CAST(len(a.sh)+len(b2.sh)-len(list_intersect(a.sh,b2.sh))"
    " AS DOUBLE) >= 0.5")
# dedup_ngram_pairs carries the jaccard VALUE, so the memo pair table
# stores it; the whole-statement tail after the Shingles CTE rewrites.
NGRAM_SELECT = (
    "\nSELECT a.doc_id AS id_a, b.doc_id AS id_b,\n"
    "  CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE) /\n"
    "  CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS DOUBLE)"
    " AS jaccard\n"
    "FROM sh a, sh b WHERE a.doc_id < b.doc_id\n"
    "  AND CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE) /\n"
    "      CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))"
    " AS DOUBLE) >= 0.5")


def memo_rewrite(sql):
    """Rewrite the known expensive fragments to read the materialized
    __memo_sh / __memo_pairs tables.  Only exact byte matches rewrite."""
    sql = sql.replace(SH_BODY, "  SELECT * FROM __memo_sh")
    for frag in (PAIRS_V1, PAIRS_V2):
        sql = sql.replace(frag, "  SELECT id_a, id_b FROM __memo_pairs")
    sql = sql.replace(
        PAIRS_HYG,
        "  SELECT id_a, id_b FROM __memo_pairs\n"
        "  WHERE id_a IN (SELECT doc_id FROM clean)\n"
        "    AND id_b IN (SELECT doc_id FROM clean)")
    sql = sql.replace(
        NGRAM_SELECT,
        "\nSELECT id_a, id_b, jaccard FROM __memo_pairs")
    return sql


def canon_str(v):
    """Path A canon: plain str(), as a naive driver would do.  None and
    NaN collapse to one token: pandas surfaces SQL NULL as None in object
    columns but duckdb .df() surfaces it as NaN, and the driver's round-1
    verdicts show it treats them as equal (mig_bool_parse passed).  Path B
    still distinguishes a true NaN value from NULL."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return "[" + ",".join(canon_str(x) for x in v.tolist()) + "]"
        if isinstance(v, np.generic):
            v = v.item()
            if isinstance(v, float) and math.isnan(v):
                return "NaN"
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_str(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_strict(v):
    """Path B canon: scale-preserving, tz-preserving."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_strict(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def lines_of(rows, cols, canon):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def drop_o(con):
    """Drop __o whatever it currently is.  DuckDB 1.0 raises (not
    IF-EXISTS-skips) when DROP VIEW hits a table of the same name and
    vice versa, so each drop is tried independently."""
    for stmt in ("DROP VIEW IF EXISTS __o", "DROP TABLE IF EXISTS __o"):
        try:
            con.execute(stmt)
        except Exception:
            pass


def pandas_rows(files):
    df = pq.ParquetDataset(files).read().to_pandas()
    cols = list(df.columns)
    rows = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    return rows, cols


def df_rows(rel_df):
    cols = list(rel_df.columns)
    rows = [tuple(rec) for rec in rel_df.itertuples(index=False, name=None)]
    return rows, cols


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    memo_pairs = "--memo-pairs" in sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if memo_pairs:
        print("[compare] --memo-pairs: materializing shingle + pair tables",
              file=sys.stderr, flush=True)
        con.execute("CREATE TEMP TABLE __memo_sh AS\n" + SH_BODY)
        con.execute("CREATE TEMP TABLE __memo_pairs AS" +
                    NGRAM_SELECT.replace(" sh a, sh b", " __memo_sh a, __memo_sh b"))
        n_sh, n_p = (con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
                     for t in ("__memo_sh", "__memo_pairs"))
        print(f"[compare] memo: {n_sh} shingle rows, {n_p} pairs",
              file=sys.stderr, flush=True)
    # effective oracle text per query (post-rewrite under the flag)
    eff_sql = {q: (memo_rewrite(t) if memo_pairs else t)
               for q, t in oracle.items()}
    if memo_pairs:
        # the flag's whole point is skipping the ~4h cartesian path for
        # the seven shingle-pair oracles — a fragment that silently
        # stopped matching (Scala-side reformat) would fall back to the
        # slow path with no signal. Fail loudly instead.
        PAIR_QUERIES = ("dedup_ngram_pairs", "dedup_components",
                        "dedup_components_star", "dedup_degree",
                        "dedup_representatives", "pipeline_hygiene",
                        "pipeline_leakage_split", "dedup_incremental_near",
                        "dedup_incremental_disk", "dedup_incremental_bucketed")
        stale = [q for q in PAIR_QUERIES
                 if q in oracle and "__memo_pairs" not in eff_sql[q]]
        if stale:
            print(f"[compare] --memo-pairs: pair fragment did NOT rewrite"
                  f" for {stale} — the Scala oracle text drifted from the"
                  f" fragment constants in tools/compare.py; refusing to"
                  f" run the cartesian path silently under the flag.",
                  file=sys.stderr, flush=True)
            sys.exit(3)
    # byte-identical oracle texts share one materialization — but ONLY
    # texts that actually repeat get a run-long memo table (the old
    # unconditional memo kept every oracle's full result alive for the
    # whole run, ~doubling peak DuckDB memory on the sf0.1 pair tables);
    # repeated-text memos are dropped once their last user has run
    uses_left = Counter(eff_sql.values())
    memo_tables = {}
    results = {}
    # run_errors.json is Verify's machine-readable failure sidecar: if a
    # query died so early that not even its marker-frame directory exists
    # (session-level failure), it would be absent from os.listdir and
    # silently vanish from this report — the round-7 failure mode. Seed
    # an explicit run_failed entry for every listed query up front; a
    # successful marker/output dir below overwrites it with the real row.
    run_errors = {}
    re_path = os.path.join(out_dir, "run_errors.json")
    if os.path.exists(re_path):
        try:
            run_errors = json.load(open(re_path))
        except Exception as e:
            print(f"[compare] unreadable run_errors.json: {e}",
                  file=sys.stderr, flush=True)
    for q, err in run_errors.items():
        results[q] = {"status": "run_failed", "err": "run_failed",
                      "error": str(err)[:300], "ok": False}
    def release(name):
        # a query is DONE with its oracle text — on EVERY exit path, not
        # just the full compare: a sharing query that crashed (marker /
        # empty dir / oracle_error) must still release the shared memo,
        # else exactly the degraded runs keep the big pair tables alive
        # to the end of the run
        sql = eff_sql.get(name)
        if sql is None:
            return
        uses_left[sql] -= 1
        if uses_left[sql] <= 0 and sql in memo_tables:
            drop_o(con)
            con.execute(f"DROP TABLE IF EXISTS {memo_tables.pop(sql)}")

    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        # progress to stderr: the all-pairs / recursive-CTE oracles run
        # for many minutes at sf0.1 — without this the tool looks hung
        print(f"[compare] {name}", file=sys.stderr, flush=True)
        # an output dir with NO parquet at all means the query failed AND
        # the marker write failed too — report it, don't fall through to
        # the oracle paths (read_parquet([]) would abort the whole run)
        if not files:
            results[name] = {"status": "run_failed", "err": "run_failed",
                             "error": "output dir exists but contains no "
                                      "parquet (marker write also failed)",
                             "ok": False}
            release(name)
            continue
        # Verify writes a one-column marker frame when the query itself
        # crashed — report it as an explicit run failure, never a pass
        cols = pq.read_schema(files[0]).names
        if cols == ["__run_failed"]:
            msg = pandas_rows(files)[0][0][0]
            results[name] = {"status": "run_failed", "err": "run_failed",
                             "error": str(msg)[:300], "ok": False}
            release(name)
            continue
        if name not in oracle:
            n = con.execute(
                "SELECT count(*) FROM read_parquet([" +
                ",".join(f"'{f}'" for f in files) + "])").fetchone()[0]
            results[name] = {"status": "rows_only", "rows": n, "ok": n > 0}
            continue
        sql = eff_sql[name]
        try:
            # materialize ONCE — the heavy oracle SQL must not run per
            # path (path A and path B both read __o). Repeated texts get
            # a shared memo table with __o as a VIEW over it (no second
            # copy); single-use texts materialize straight into __o.
            drop_o(con)
            if uses_left[sql] > 1 or sql in memo_tables:
                if sql not in memo_tables:
                    tname = f"__memo_o_{len(memo_tables)}"
                    con.execute(f"CREATE TEMP TABLE {tname} AS " + sql)
                    memo_tables[sql] = tname
                con.execute("CREATE TEMP VIEW __o AS "
                            f"SELECT * FROM {memo_tables[sql]}")
            else:
                con.execute("CREATE TEMP TABLE __o AS " + sql)
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:300]}
            release(name)
            continue

        # path A: pandas read of mine vs duckdb .df() of oracle, str canon
        mrows_a, mcols_a = pandas_rows(files)
        orows_a, ocols_a = df_rows(con.execute("SELECT * FROM __o").df())
        la_m = lines_of(mrows_a, mcols_a, canon_str)
        la_o = lines_of(orows_a, ocols_a, canon_str)

        # path B: duckdb fetchall both sides, strict canon
        rel = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        mcols_b = [c[0] for c in rel.description]
        mrows_b = rel.fetchall()
        orel = con.execute("SELECT * FROM __o")
        ocols_b = [c[0] for c in orel.description]
        orows_b = orel.fetchall()
        lb_m = lines_of(mrows_b, mcols_b, canon_strict)
        lb_o = lines_of(orows_b, ocols_b, canon_strict)

        schema_ok = sorted(mcols_a) == sorted(ocols_a)
        rows_ok = len(mrows_a) == len(orows_a)
        hash_a = la_m == la_o
        hash_b = lb_m == lb_o
        results[name] = {
            "status": "compared", "schema": schema_ok, "rows": rows_ok,
            "hash_pandas_vs_df": hash_a, "hash_fetchall_strict": hash_b,
            "hash": hash_a and hash_b,
            "n_mine": len(mrows_a), "n_oracle": len(orows_a),
            "mine_cols": sorted(mcols_a), "oracle_cols": sorted(ocols_a)}
        for tag, (lm, lo) in (("A", (la_m, la_o)), ("B", (lb_m, lb_o))):
            if lm != lo and schema_ok and rows_ok:
                diffs = [(a, b) for a, b in zip(lm, lo) if a != b][:3]
                results[name][f"first_diffs_{tag}"] = diffs
        # this query is done with __o — free a repeated-text memo as
        # soon as its last user has run (bounds peak memory to the
        # concurrently-live memos, not the whole run's oracle set)
        release(name)
    # run_errors entries with NO output dir at all never enter the dir
    # loop above, so their release() never fires — if such a query
    # shares an oracle text, the shared memo table would stay alive to
    # the end of the run. Release them here.
    listed = set(os.listdir(out_dir))
    for q in run_errors:
        if q not in listed:
            release(q)
    # any oracle-registered query with neither an output dir nor a
    # run_errors entry is MISSING — absent is never a pass
    for q in oracle:
        if q not in results:
            results[q] = {"status": "missing_output", "err": "missing",
                          "error": "oracle-registered query has no output "
                                   "dir and no run_errors entry", "ok": False}
    ok = all(r.get("hash") or r.get("ok") for r in results.values())
    print(json.dumps(results, indent=1, default=str))
    bad = [k for k, r in results.items()
           if not (r.get("hash") or r.get("ok"))]
    print("ALL OK" if ok else f"FAILURES: {bad}")


if __name__ == "__main__":
    main()
