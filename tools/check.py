#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB differential check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [onlyIdsCsv]

For each query dumped by graft.Verify, runs the oracle SQL in DuckDB
(with each fixture parquet registered under its bare table name) and
compares values exactly: columns sorted by name, rows sorted by all
columns. Prints PASS/FAIL per query. Dev tool only — not shipped code.

A missing dump dir counts as FAIL (Verify catches Throwable per query,
so a crashed query leaves no dir — skipping it would silently mask the
crash). Pass onlyIdsCsv (same value given to Verify) when checking a
subset dump; only then are other ids skipped.
"""
import json
import math
import sys

import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    return v


def table_of(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def main(sf_dir, out_dir, only_ids=None):
    con = duckdb.connect()
    import os as _os
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # fixture tables are single files; ScaleUp replicas are
        # Spark-written DIRECTORIES of part files — bind either layout
        path = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    if only_ids is not None:
        # an id that matches no oracle (typo, or a rows-only id) would
        # otherwise skip everything and report "0 pass, 0 fail" as green
        for unknown in sorted(only_ids - set(oracle)):
            print(f"FAIL {unknown}: not an oracle-checked id (typo? rows-only?)")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if only_ids is not None and name not in only_ids:
            continue  # explicitly-requested subset dump
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: no dump dir (query crashed in Verify?)")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            gc, gr = table_of(got)
            wc, wr = table_of(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}")
                n_fail += 1
            elif len(gr) != len(wr):
                print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
                n_fail += 1
            elif gr != wr:
                bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
                print(f"FAIL {name}: first diff at sorted-row {bad}:")
                print(f"  spark: {gr[bad]}")
                print(f"  duck : {wr[bad]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    ids = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], ids))
