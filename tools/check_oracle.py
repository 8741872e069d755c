#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dump produced by graft.Verify, runs the matching
DuckDB oracle from oracle_sql.json against the sf parquet tables, and
compares the way the driver does: columns sorted by NAME, but rows in
EMITTED order — so a wrong/missing ORDER BY fails here too. A sorted-rows
comparison is reported only as a secondary diagnostic to tell "ordering
bug" apart from "value bug".
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and represent with enough digits to catch real diffs
        if v == 0:
            v = 0.0
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(cols, data):
    """Columns sorted by name (driver semantics); rows kept in emitted order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(row[i]) for i in order) for row in data]
    return out, [cols[i] for i in order]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1; failures.append(name)
            continue
        try:
            spark_tbl = pq.read_table(d)
            scols = spark_tbl.column_names
            srows = list(zip(*[spark_tbl.column(c).to_pylist() for c in scols])) if scols else []
            res = con.execute(oracle[name])
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1; failures.append(name)
            continue
        s_rows, s_names = rows_of(scols, srows)
        d_rows, d_names = rows_of(dcols, drows)
        if s_names != d_names:
            print(f"FAIL {name}: columns spark={s_names} duck={d_names}")
            n_fail += 1; failures.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1; failures.append(name)
            continue
        diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
        if diff:
            order_only = sorted(s_rows) == sorted(d_rows)
            kind = "ROW-ORDER mismatch (values equal when sorted)" if order_only \
                else "value mismatch"
            print(f"FAIL {name}: {len(diff)}/{len(s_rows)} differing rows; {kind}; cols={s_names}")
            for a, b in diff[:3]:
                print(f"   spark={a}\n   duck ={b}")
            n_fail += 1; failures.append(name)
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed" + (f": {failures}" if failures else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
