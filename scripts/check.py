#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only;
not part of the shipped library). Usage:
    python3 scripts/check.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json entry in DuckDB over <sfDir>/*.parquet and
compares against <verifyOutDir>/<name>/*.parquet value-by-value
(columns sorted by name, rows sorted, exact equality)."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def load_result(d):
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl.to_pandas()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        got = load_result(os.path.join(out_dir, name))
        if got is None:
            print(f"MISSING  {name}: no parquet output"); n_bad += 1; continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA   {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            n_bad += 1; continue
        if len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} duckdb={len(w)}"); n_bad += 1; continue
        # The driver hashes typed values, so an int column on one side vs a
        # float on the other (e.g. DuckDB HUGEINT -> pandas float64) hash-
        # mismatches even when the values compare equal. Flag dtype-kind
        # divergence as a failure here too.
        kind_bad = [c for c in g.columns
                    if (g[c].dtype.kind in "iu") != (w[c].dtype.kind in "iu")
                    and not (g[c].dtype.kind == "O" or w[c].dtype.kind == "O")]
        if kind_bad:
            print(f"DTYPE    {name}: int/float divergence in {kind_bad} "
                  f"(spark={[str(g[c].dtype) for c in kind_bad]}, "
                  f"duckdb={[str(w[c].dtype) for c in kind_bad]})")
            n_bad += 1; continue
        try:
            import pandas as pd
            eq = g.astype(object).where(g.notna(), None).equals(
                 w.astype(object).where(w.notna(), None))
        except Exception:
            eq = False
        if not eq:
            diff_cols = []
            for c in g.columns:
                a, b = g[c], w[c]
                try:
                    same = (a.astype(object).where(a.notna(), None) ==
                            b.astype(object).where(b.notna(), None)).all()
                except Exception:
                    same = False
                if not same:
                    diff_cols.append(c)
            print(f"VALUES   {name}: differing cols {diff_cols}")
            for c in diff_cols[:2]:
                m = (g[c] != w[c])
                print(f"  {c}: spark={g[c][m].head(3).tolist()} duckdb={w[c][m].head(3).tolist()}")
            n_bad += 1; continue
        print(f"OK       {name} ({len(g)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv[1], sys.argv[2]))
    except BrokenPipeError:
        sys.exit(0)
