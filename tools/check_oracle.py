#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against views over
the same fixture parquet tables, sorts columns by name on both sides,
and compares exactly (NaN==NaN). This is tooling for the build loop
only — the library itself has no Python dependency.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


# Driver parity (default): the driver hash-compares EXACTLY, and its
# hash distinguishes IEEE signed zeros — q270 round-11 shipped red
# because this tool's 2e-6 tolerance said pass while the driver said
# fail (-0.0 vs 0.0). Exact mode is therefore the default and the ONLY
# mode allowed to write the committed sweep artifact; the tolerance
# mode survives behind GRAFT_ORACLE_TOL=1 for dev triage (locating
# which column drifts, by how much).
TOLERANT = os.environ.get("GRAFT_ORACLE_TOL") == "1"


def compare(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    a, b = norm(spark_df), norm(duck_df)
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            problems.append(f"dtype[{c}]: spark={av.dtype} duck={bv.dtype}")
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                if TOLERANT:
                    # Both engines round(x, 6) independently; an ulp
                    # difference near a rounding boundary flips the 6th
                    # decimal, i.e. a 1e-6 disagreement.
                    ok = ((av.isna() & bv.isna()) |
                          ((av - bv).abs() <= 2e-6))
                else:
                    # exact: value-equal AND same sign bit (so -0.0 is
                    # distinguished from 0.0, like the driver's hash);
                    # NaN==NaN.
                    avf = av.astype("float64").to_numpy()
                    bvf = bv.astype("float64").to_numpy()
                    ok = pd.Series(
                        (np.isnan(avf) & np.isnan(bvf)) |
                        ((avf == bvf) &
                         (np.signbit(avf) == np.signbit(bvf))),
                        index=av.index)
            else:
                ok = (av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object))
            nbad = int((~ok).sum())
            if nbad:
                idx = (~ok).idxmax()
                problems.append(
                    f"values[{c}]: {nbad}/{len(a)} mismatch; first at row {idx}: "
                    f"spark={av[idx]!r} duck={bv[idx]!r}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"compare[{c}] failed: {e}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    # The manifest closes the crashed-query hole: a query that threw in
    # Verify writes no output dir and would otherwise vanish from this
    # report entirely (RegistrySpec keeps the manifest in sync).
    manifest_path = os.path.join(os.path.dirname(__file__), "query_manifest.txt")
    if os.path.exists(manifest_path):
        expected = {l.strip() for l in open(manifest_path) if l.strip()}
        for name in sorted(expected):
            if only and name not in only:
                continue
            if not os.path.isdir(f"{out_dir}/{name}"):
                results[name] = ["MISSING OUTPUT (query crashed in Verify?)"]
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if name in results:  # already flagged missing
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = ["NO SPARK OUTPUT"]
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"DUCKDB ERROR: {e}"]
            continue
        results[name] = compare(name, spark_df, duck_df)
    # queries without oracle → rows-only check
    for path in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(path.rstrip("/"))
        if name in oracle or (only and name not in only):
            continue
        files = glob.glob(f"{path}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        results[name] = [] if n > 0 else ["NO-ORACLE query returned 0 rows"]
    npass = sum(1 for v in results.values() if not v)
    for name, probs in results.items():
        status = "PASS" if not probs else "FAIL"
        print(f"{status} {name}")
        for p in probs:
            print(f"     {p}")
    print(f"\n{npass}/{len(results)} pass")
    # optional committed artifact (e.g. the per-round sf0.1 sweep):
    # GRAFT_ORACLE_JSON=<path> writes {name: {pass, problems}} + totals
    json_out = os.environ.get("GRAFT_ORACLE_JSON")
    if json_out and TOLERANT:
        sys.exit("refusing to write committed artifact in tolerance mode "
                 "(unset GRAFT_ORACLE_TOL — the driver compares exactly)")
    if json_out:
        payload = {
            "sf_dir": sf_dir,
            "pass": npass,
            "total": len(results),
            "queries": {n: {"pass": not v, "problems": v}
                        for n, v in sorted(results.items())},
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
