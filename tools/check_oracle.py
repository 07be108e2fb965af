#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB
against the same parquet tables and compares row count, schema, and
sorted values. Dev-only tool — not part of the shipped library.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return f"{v!r}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # GenData tiers are Spark part-file dirs
            p = os.path.join(p, "*.parquet")
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetch_arrow_table()
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={got.num_rows}"
            continue
        try:
            exp = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {str(e)[:200]}"
            continue
        status = []
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            status.append(f"COLS got={g_cols} exp={e_cols}")
        else:
            gs = got.select(g_cols)
            es = exp.select(e_cols)
            if str(gs.schema) != str(es.schema):
                status.append(
                    f"SCHEMA\n  got={gs.schema}\n  exp={es.schema}".replace("\n", " | "))
            if got.num_rows != exp.num_rows:
                status.append(f"NROWS got={got.num_rows} exp={exp.num_rows}")
            else:
                g_rows = sorted(tuple(norm(v) for v in r.values())
                                for r in gs.to_pylist())
                e_rows = sorted(tuple(norm(v) for v in r.values())
                                for r in es.to_pylist())
                if g_rows != e_rows:
                    diff = [(a, b) for a, b in zip(g_rows, e_rows) if a != b][:3]
                    status.append(f"VALUES first-diffs={diff}")
        results[name] = "OK" if not status else "; ".join(status)
    width = max(len(k) for k in results) if results else 0
    fails = 0
    for k in sorted(results):
        ok = results[k] == "OK" or results[k].startswith("ROWS_ONLY")
        fails += 0 if ok else 1
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
