#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads the Verify output dir (result parquet per query + oracle_sql.json),
runs each oracle against the raw testdata tables in DuckDB, and compares:
row count, column names, and a hash over column-name-sorted values.
Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_fingerprint(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    results = {}
    all_queries = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    # a query that THREW in Verify has no result dir — only the
    # <name>._error marker Verify writes; surface it as a failure
    # instead of letting the query vanish from the report (the round-8
    # failure mode: 7 broken queries read as "96/96 pass")
    for f in sorted(os.listdir(out_dir)):
        if f.endswith("._error"):
            name = f[:-len("._error")]
            msg = open(os.path.join(out_dir, f)).read().strip()
            results[name] = f"QUERY FAILED in Verify: {msg[:200]}"
    # an oracle entry with neither a result dir nor an error marker
    # means Verify never attempted it (filter typo, stale oracle map)
    for name in oracle:
        if name not in results and name not in all_queries:
            results[name] = "MISSING: oracle defined but no Verify result"
    for name in all_queries:
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            results[name] = f"ERROR reading result: {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only: {len(got_rows)} rows"
            continue
        try:
            exp = con.execute(oracle[name])
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        problems = []
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"cols {sorted(got_cols)} != {sorted(exp_cols)}")
        if len(got_rows) != len(exp_rows):
            problems.append(f"rows {len(got_rows)} != {len(exp_rows)}")
        if not problems:
            hg = table_fingerprint(got_rows, got_cols)
            he = table_fingerprint(exp_rows, exp_cols)
            if hg != he:
                # find first mismatching canonical row for debugging
                order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                order_e = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
                cg = sorted("|".join(canon(r[i]) for i in order_g) for r in got_rows)
                ce = sorted("|".join(canon(r[i]) for i in order_e) for r in exp_rows)
                diff = next(((a, b) for a, b in zip(cg, ce) if a != b), ("<end>", "<end>"))
                problems.append(f"hash mismatch; first diff:\n  got: {diff[0][:200]}\n  exp: {diff[1][:200]}")
        results[name] = "OK" if not problems else "; ".join(problems)
    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for name, v in results.items():
        print(f"{name:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass ({sum(1 for v in results.values() if v == 'OK')} hash-verified)")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
