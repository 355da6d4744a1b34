#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet dir produced by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB against views over the sf parquet tables, and
compares EXACTLY the way the driver does: sort columns by name, sort rows via
pandas sort_values (array cells are a hard ERROR, just like the driver's
lexsort), then hash the STRINGIFIED cells.  String comparison means
int-vs-float ("880" vs "880.0") and -0.0-vs-0.0 mismatches fail here exactly
as they fail the driver — no float tolerance, no array normalization.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame):
    """Driver-equivalent canonical form: columns sorted by name, rows sorted
    by all columns, every cell stringified.  Raises on unsortable (array)
    cells — the driver does too."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df.astype(str)

def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()

def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"SKIP  {name}: no parquet output"); n_skip += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)"); n_skip += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        try:
            g = canon(got)
        except Exception as e:
            print(f"FAIL  {name}: spark output not gate-sortable "
                  f"(array column?): {type(e).__name__}: {e}")
            n_fail += 1; continue
        try:
            e_ = canon(exp)
        except Exception as ex:
            print(f"FAIL  {name}: oracle output not gate-sortable "
                  f"(array column?): {type(ex).__name__}: {ex}")
            n_fail += 1; continue
        if list(g.columns) != list(e_.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e_.columns)}")
            n_fail += 1; continue
        if len(g) != len(e_):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e_)}"); n_fail += 1; continue
        if table_hash(g) != table_hash(e_):
            bad = None
            for i in range(len(g)):
                for c in g.columns:
                    if g[c].iloc[i] != e_[c].iloc[i]:
                        bad = (i, c, g[c].iloc[i], e_[c].iloc[i]); break
                if bad: break
            print(f"FAIL  {name}: hash mismatch at row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} duck={bad[3]!r}" if bad else
                  f"FAIL  {name}: hash mismatch (row-order-only difference)")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only/skip")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
