#!/usr/bin/env python3
"""Dtype-parity audit between each oracle's DuckDB result and the Spark
dump (round 16 adjudication).

Usage: python3 tools/dtype_audit.py <sfDir> <verifyOutDir>

Why: the driver's row hasher is dtype-sensitive — a DuckDB HUGEINT
column (what sum(BIGINT) returns) lands in pandas as OBJECT while the
Spark dump reads back as int64, and the hash mismatches even when every
value is equal. Round 16 found that the only HUGEINT-emitting oracles
on the board were exactly the driver-red sum-emitting ids
(rfm_segments.cents, select_budget*.cum_tokens, bpe_fertility.total_*)
while tools/check.py's value-exact compare stayed green. The rule this
audit enforces: every oracle column's pandas dtype must EQUAL the
Spark-dump column's pandas dtype (wrap integer sums in
CAST(... AS BIGINT); never emit HUGEINT / unmatched INTEGER widths).

Run it on a FULL Verify dump — dynamic (model-embedding) oracles only
materialize in oracle_sql.json after their queries executed.
Dev tool only — not shipped code.
"""
import json
import os
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"SKIP {name}: no dump dir")
            continue
        try:
            want = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            for c in sorted(set(want.columns) & set(got.columns)):
                dw, dg = str(want[c].dtype), str(got[c].dtype)
                if dw != dg:
                    print(f"FAIL {name}.{c}: oracle dtype {dw} != spark dtype {dg}")
                    n_bad += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:100]}")
            n_bad += 1
    print(f"\n{n_bad} dtype mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
