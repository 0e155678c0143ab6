#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

For each query in <verifyOutDir>/oracle_sql.json: load the Spark parquet
result, run the oracle SQL in DuckDB over the same tables, sort columns by
name, sort rows, and compare cell-by-cell (exact for non-floats, exact-or-
report-maxdiff for floats).

Round-12 addition (the CORRECTNESS_r11.json == `{}` incident): besides the
human-readable PASS/FAIL lines, write a machine-readable attestation in the
driver's own schema ({rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err} per query) to [jsonOut] (default
correctness_local_r{SPARK_GRAFT_ROUND}.json in the cwd). Committing that
file at round end gives every round a correctness record even if the
driver-side pipeline blanks again.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir, outdir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is a flat file per table; Spark-written scale
        # replicas (tools/ScaleUp) are DIRECTORIES of part files
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    record = {}

    def rec(name, rows_match, schema_match, hash_match, spark_rows,
            oracle_rows, err):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name in sorted(oracle):
        sql = oracle[name]
        path = f"{outdir}/{name}"
        # determinism lint: HUGEINT oracle outputs (uncast integer SUMs)
        # convert differently across duckdb client versions (int64 vs
        # float64/decimal128) — values match, the driver's hash doesn't.
        # This was the root cause of 9 of round 10's driver-red queries.
        try:
            types = con.execute(f"DESCRIBE {sql}").fetchall()
            huge = [c for (c, t, *_) in types if "HUGEINT" in t]
            if huge:
                print(f"FAIL {name}: HUGEINT oracle output column(s) "
                      f"{huge} — CAST the integer SUM to BIGINT")
                rec(name, None, False, False, None, None, f"hugeint:{huge}")
                n_fail += 1
                continue
        except Exception:
            pass  # describe failure surfaces below as an sql error
        try:
            spark_df = pd.read_parquet(path)
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            rec(name, None, None, None, None, None, "no_spark_output")
            n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            rec(name, None, None, None, len(spark_df), None,
                f"oracle_sql_error: {e}")
            n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            rec(name, None, False, False, len(s), len(d), "schema_mismatch")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            rec(name, False, True, False, len(s), len(d), "row_count_mismatch")
            n_fail += 1; continue
        ok = True
        for c in s.columns:
            sv, dv = s[c].values, d[c].values
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
                sv = sv.astype(float); dv = dv.astype(float)
                both_nan = np.isnan(sv) & np.isnan(dv)
                eq = (sv == dv) | both_nan
                if not eq.all():
                    diff = np.nanmax(np.abs(sv - dv))
                    print(f"FAIL {name}: col {c} maxdiff={diff} ({int((~eq).sum())} cells)")
                    ok = False
            else:
                if not (sv == dv).all():
                    bad = np.argmax(sv != dv)
                    print(f"FAIL {name}: col {c} first mismatch row {bad}: "
                          f"spark={sv[bad]!r} duck={dv[bad]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(s)} rows)")
            rec(name, True, True, True, len(s), len(d), None)
            n_pass += 1
        else:
            rec(name, True, True, False, len(s), len(d), "value_mismatch")
            n_fail += 1
    # rows-only queries (no oracle): just report row counts
    for path in sorted(glob.glob(f"{outdir}/q*")):
        name = os.path.basename(path)
        if name not in oracle and os.path.isdir(path):
            try:
                n = len(pd.read_parquet(path))
                print(f"ROWS {name}: {n}")
                rec(name, None, None, None, n, None, "no_oracle")
            except Exception as e:
                print(f"ROWS {name}: unreadable ({e})")
                rec(name, None, None, None, None, None, "no_oracle_unreadable")
    if json_out is None:
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        if rnd is None:
            # infer like Bench does: the driver's BENCH_r{N}.json files
            # name past rounds; this run belongs to max(N)+1
            import re as _re
            seen = [int(m.group(1)) for f in os.listdir("/root/repo")
                    if (m := _re.match(r"BENCH_r(\d+)\.json$", f))]
            rnd = str(max(seen) + 1) if seen else "current"
        json_out = f"correctness_local_r{rnd}.json"
    with open(json_out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass / {n_fail} fail  (attestation: {json_out}, "
          f"{len(record)} entries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
