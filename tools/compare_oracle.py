#!/usr/bin/env python3
"""Dev-only pre-check that mimics the driver's DuckDB oracle compare:
runs each oracle SQL over the sf parquet tables, loads the corresponding
Spark result parquet, sorts columns by name, and compares values.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        want = want.select(wcols)
        got = got.select(gcols)
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: oracle={want.num_rows} spark={got.num_rows}")
            n_fail += 1
            continue
        wp, gp = want.to_pylist(), got.to_pylist()
        bad = None
        for i, (wr, gr) in enumerate(zip(wp, gp)):
            for c in wcols:
                a, b = norm(wr[c]), norm(gr[c])
                if a != b:
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
            # schema detail for debugging
            print(f"     oracle type={want.schema.field(c).type} spark type={got.schema.field(c).type}")
            n_fail += 1
        else:
            # also flag schema (type) mismatches even when values compare equal
            tmism = [(c, str(want.schema.field(c).type), str(got.schema.field(c).type))
                     for c in wcols if want.schema.field(c).type != got.schema.field(c).type]
            note = f"  [type-mismatch: {tmism}]" if tmism else ""
            print(f"PASS {name} ({want.num_rows} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
