"""Driver-gate simulation: vanilla SparkSession + DuckDB oracle over
the CURATED 50 (or named queries), at the driver's grading SF.

Mirrors the harness: imports __spark_entry__ by module name, uses a
bare local session (NOT get_spark), resolves oracles via oracle_sql(),
compares with tests.oracle_utils.canon_frame.

Usage: python scripts/driver_sim.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = args.sf

    import duckdb
    import importlib
    import pandas as pd
    from pyspark.sql import SparkSession

    from tests.oracle_utils import canon_frame

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mod = importlib.import_module("__spark_entry__")
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = args.names or list(qs)
    # named non-curated queries: pull from the extended registry with
    # oracles resolved at the same sf (mirrors tests/test_oracle.py)
    missing = [n for n in names if n not in qs]
    if missing:
        from bigdata_kafka_2_spark.plans import load_extended, resolve_oracle

        ext = load_extended()
        for n in missing:
            q = ext[n]
            qs[n] = q.spark_fn
            sql = resolve_oracle(q, args.sf)
            if sql is not None:
                oracles[n] = sql

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            spdf = pd.DataFrame(
                [r.asDict() for r in sdf.collect()], columns=sdf.columns
            )
            if name not in oracles:
                n_rowsonly += 1
                print(f"ROWS-ONLY {name}: {len(spdf)} rows")
                continue
            opdf = con.execute(oracles[name]).fetch_df()
            sc, sr = canon_frame(spdf)
            oc, orows = canon_frame(opdf)
            if sc == oc and sr == orows:
                n_pass += 1
                print(f"PASS {name} ({len(sr)} rows)")
            else:
                n_fail += 1
                print(f"FAIL {name}: cols {sc == oc} rows {sr == orows}")
                if sc != oc:
                    print(f"  spark cols: {sc}\n  duck  cols: {oc}")
                else:
                    diff = [
                        (a, b)
                        for a, b in zip(sr, orows)
                        if a != b
                    ][:3]
                    print(f"  nrows {len(sr)} vs {len(orows)}; first diffs: {diff}")
        except Exception:
            n_fail += 1
            print(f"ERR  {name}")
            traceback.print_exc()
    print(f"\nTOTAL pass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
