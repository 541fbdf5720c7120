#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Runs each oracle_sql.json query in DuckDB over the sf parquet tables,
loads the Spark-written parquet for the same query name, sorts columns by
name and rows by all values, and compares cell-by-cell (exact for
ints/strings, tiny epsilon report for floats — the driver hashes, so we
flag ANY float difference).

Dev tooling only — NOT part of the library (driver-side python deps).
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
            ora_df = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(spark_df.columns) != list(ora_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} oracle={list(ora_df.columns)}")
            ok = False
        elif len(spark_df) != len(ora_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(ora_df)}")
            ok = False
        else:
            for c in spark_df.columns:
                a, b = spark_df[c].values, ora_df[c].values
                a_float = np.issubdtype(spark_df[c].dtype, np.floating)
                b_float = np.issubdtype(ora_df[c].dtype, np.floating)
                a_int = np.issubdtype(spark_df[c].dtype, np.integer)
                b_int = np.issubdtype(ora_df[c].dtype, np.integer)
                # Driver-faithful: the driver hashes FORMATTED cells, so an
                # int column on one side rendered against a float column on
                # the other ("44" vs "44.0") is a mismatch even when the
                # values are numerically equal (r3: HUGEINT n_bpe_tokens).
                if (a_float and b_int) or (a_int and b_float):
                    print(f"FAIL {name}: col {c} dtype spark={spark_df[c].dtype} "
                          f"oracle={ora_df[c].dtype} (int-vs-float render mismatch)")
                    ok = False
                elif a_float or b_float:
                    af = a.astype(float); bf = b.astype(float)
                    # signbit: -0.0 formats as "-0.0", +0.0 as "0.0" — the
                    # driver's hash distinguishes them (r3: DuckDB round()
                    # emitting -0.0 on exactly-parallel k_cos rows).
                    bad = ~(((af == bf) & (np.signbit(af) == np.signbit(bf)))
                            | (np.isnan(af) & np.isnan(bf)))
                    if bad.any():
                        i = int(np.argmax(bad))
                        print(f"FAIL {name}: col {c} row {i}: spark={af[i]!r} oracle={bf[i]!r} (n_bad={bad.sum()})")
                        ok = False
                        break
                else:
                    if not (pd.Series(a).astype(str).values == pd.Series(b).astype(str).values).all():
                        bad = pd.Series(a).astype(str).values != pd.Series(b).astype(str).values
                        i = int(np.argmax(bad))
                        print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} (n_bad={bad.sum()})")
                        ok = False
                        break
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    extra = set(glob.glob(f"{outdir}/*/")) and None
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} oracles ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
