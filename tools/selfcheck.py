#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
the sfDir tables registered as views, and compares schema + values.
Dev-tool only — the shipped library has no Python/DuckDB dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_key(rows):
    return sorted([tuple(str(norm(v)) for v in r) for r in rows])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").fetch_arrow_table()
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: no oracle (rows={got.num_rows})")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            n_fail += 1
            print(f"  ✗ {name}: COLUMNS got={gcols} exp={ecols}")
            continue
        g = got.select(gcols).to_pylist()
        e = exp.select(ecols).to_pylist()
        grows = rows_key([tuple(r[c] for c in gcols) for r in g])
        erows = rows_key([tuple(r[c] for c in ecols) for r in e])
        if len(grows) != len(erows):
            n_fail += 1
            print(f"  ✗ {name}: ROWS got={len(grows)} exp={len(erows)}")
            continue
        if grows != erows:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
            print(f"  ✗ {name}: VALUES differ, first diffs:")
            for a, b in diffs:
                print(f"      got {a}\n      exp {b}")
            continue
        # schema type check (informational)
        gt = [str(got.schema.field(c).type) for c in gcols]
        et = [str(exp.schema.field(c).type) for c in ecols]
        tnote = "" if gt == et else f"  [type drift: {list(zip(gcols, gt, et))}]"
        n_pass += 1
        print(f"  ✓ {name} ({got.num_rows} rows){tnote}")
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
