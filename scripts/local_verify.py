#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev feedback loop only;
not part of the library). Reads the parquet dumps written by graft.Verify,
runs each oracle SQL in DuckDB over the same sf tables, and compares:
  - schema: same column-name set
  - rows: same count
  - values: sorted by all columns; exact match required, with a report of
    near-miss magnitudes so float drift is visible before the driver sees it.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: we demand bit-exactness
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(cols, table):
    names = sorted(cols)
    data = [table[n] for n in names]
    return sorted(tuple(canon(v) for v in row) for row in zip(*data)), names


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pdir = Path(out_dir, name)
        if not pdir.exists():
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(pdir)
            spark_cols = {c: spark_tbl.column(c).to_pylist() for c in spark_tbl.column_names}
            # Driver-harness hazard: DuckDB widens SUM(BIGINT) to HUGEINT
            # (int128), which the driver canonicalizes differently than
            # int64 (r2 regression: 13 hash mismatches). Oracles must cast
            # integer sums to BIGINT explicitly.
            rel = con.sql(sql)
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper()]
            if hug:
                print(f"FAIL {name}: oracle returns HUGEINT column(s) {hug}; "
                      f"wrap in CAST(... AS BIGINT)")
                n_fail += 1
                continue
            duck = con.execute(sql)
            duck_names = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
            duck_cols = {n: [r[i] for r in duck_rows] for i, n in enumerate(duck_names)}
        except Exception as e:
            print(f"FAIL {name}: execution error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        s_rows, names = rows_of(spark_cols, spark_cols)
        d_rows, _ = rows_of(duck_cols, duck_cols)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        if s_rows == d_rows:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(s_rows)} rows differ; cols={names}")
            for i, a, b in diffs[:3]:
                print(f"  row {i}\n   spark={a}\n   duck ={b}")
            # near-miss report: max abs/rel delta per float-parseable column
            worst = {}
            for _, a, b in diffs:
                for col, (x, y) in zip(names, zip(a, b)):
                    try:
                        fx, fy = float(x), float(y)
                    except ValueError:
                        continue
                    ad = abs(fx - fy)
                    rd = ad / max(abs(fx), abs(fy), 1e-300)
                    if ad > 0 and ad >= worst.get(col, (0, 0))[0]:
                        worst[col] = (ad, rd)
            for col, (ad, rd) in sorted(worst.items()):
                print(f"  near-miss {col}: max_abs={ad:.3e} max_rel={rd:.3e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if n_pass == 0:
        print("FAIL: zero queries passed (empty selection is a failure)")
        sys.exit(1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
