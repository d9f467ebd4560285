#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables,
canonicalizes both (sort columns by name, sort rows by all columns), and
compares values exactly. Exit 1 on any mismatch.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable total order incl. floats/lists/timestamps
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def align_date_dtypes(s: pd.DataFrame, d: pd.DataFrame):
    """date32 parquet columns land as object(datetime.date) on one side
    while the other engine yields datetime64[ns] — same calendar values,
    different pandas dtype kind, producing a permanent WARN per date
    column. Convert the datetime64 side to plain dates when (a) the
    other side holds date objects and (b) every timestamp is midnight,
    so both the dtype check and the stringified compare see one
    representation. Any genuine value drift still fails the compare."""
    import datetime
    for c in s.columns:
        if c not in d.columns:
            continue
        for x, other, frame in ((s[c], d[c], s), (d[c], s[c], d)):
            if x.dtype.kind != "M" or other.dtype.kind != "O":
                continue
            probe = other.dropna().head(5)
            if not all(isinstance(v, datetime.date)
                       and not isinstance(v, datetime.datetime)
                       for v in probe):
                continue
            nn = x.dropna()
            if (nn == nn.dt.normalize()).all():
                frame[c] = x.dt.date
    return s, d


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{outdir}/{name}"
        parts = glob.glob(f"{res_dir}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no spark output at {res_dir}")
            failures += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        s, d = align_date_dtypes(s, d)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        # dtype drift is a schema-check risk driver-side; warn loudly
        for c in s.columns:
            ks, kd = s[c].dtype.kind, d[c].dtype.kind
            if ks != kd and len(s):
                print(f"WARN {name}.{c}: dtype spark={s[c].dtype} duck={d[c].dtype}")
        # exact compare on stringified values (what a hash would see)
        mism = (s.astype(str).values != d.astype(str).values)
        if mism.any():
            n = int(mism.any(axis=1).sum())
            print(f"FAIL {name}: {n}/{len(s)} mismatching rows")
            idx = mism.any(axis=1).nonzero()[0][:3]
            for i in idx:
                print(f"  spark: {s.iloc[i].to_dict()}")
                print(f"  duck : {d.iloc[i].to_dict()}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s)} rows, {len(s.columns)} cols")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
