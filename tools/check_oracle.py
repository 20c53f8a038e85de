#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only,
not part of the library). Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Loads each <name>.parquet Spark result, runs the matching oracle_sql.json
entry in DuckDB (tables registered as views over the sf dir), then compares:
columns sorted by name, rows sorted, values hashed.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class ArrayColumnError(Exception):
    """The driver's compare sorts raw pandas values and CRASHES on array
    cells (unhashable numpy.ndarray — round-3 corpus_tag_themes failure).
    Replicate that as a loud local failure: driver queries must emit
    scalar columns only (join arrays to strings at the boundary)."""


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            bad = df[c].apply(lambda v: isinstance(v, (list, tuple)) or
                              str(type(v)).find("ndarray") >= 0)
            if bad.any():
                raise ArrayColumnError(
                    f"column '{c}' holds array values — the driver's pandas "
                    "sort will crash on these; emit a joined string instead")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")],
                             ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name}: rows-only ({len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            a, b = canon(spark_df), canon(oracle_df)
        except ArrayColumnError as e:
            print(f"FAIL  {name}: {e}")
            n_fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        try:
            # dtype-EXACT: the driver's hash is dtype-sensitive (an int64
            # column that round-trips as float64 hashes differently even
            # when values match — round-5 q_event_transitions failure).
            # A gate blinder than the driver lets red rows ship green.
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch:\n{str(e)[:800]}")
            # show first differing rows
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark :", a.loc[i].to_dict())
                print("  oracle:", b.loc[i].to_dict())
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
