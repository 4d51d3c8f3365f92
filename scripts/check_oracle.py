#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name + rows by value, and compares.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if list(got.columns) == ["__verify_error"]:
            # graft.Verify writes this sentinel when the query crashed.
            print(f"  [FAIL-crash] {name}: query raised at runtime")
            n_fail += 1
            continue
        if name not in oracle:
            tag = "rows-only" if len(got) > 0 else "FAIL-0row"
            if len(got) == 0:
                n_fail += 1
            print(f"  [{tag}] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok_schema = list(g.columns) == list(e.columns)
        ok_rows = len(g) == len(e)
        # Dtype-kind guard: the driver's hash is dtype-strict, so an
        # integer column on the Spark side vs a float column from the
        # oracle (e.g. DuckDB sum(BIGINT) -> HUGEINT -> pandas float64,
        # r12 sp13/st11) must FAIL here even though values compare
        # equal under check_dtype=False.
        bad_kinds = []
        if ok_schema:
            for c in g.columns:
                dg, de = g[c].dtype, e[c].dtype
                # numeric columns must match kind AND width (ADVICE
                # r13). Evidence note: the three width-only mismatches
                # this first flagged (s01/t07/mm01, int32 vs int64)
                # were driver-GREEN through r13, so the driver's hash
                # canonicalizes width within a kind and only cross-kind
                # (int vs float, the r12 sp13/st11 class) fails it.
                # Width-strictness here is deliberate local discipline:
                # align the oracle CASTs instead of relying on that.
                if (dg.kind in "iuf" or de.kind in "iuf") and \
                   (dg.kind != de.kind or dg.itemsize != de.itemsize):
                    bad_kinds.append(f"{c}: spark={dg} oracle={de}")
        if bad_kinds:
            n_fail += 1
            print(f"  [FAIL-dtype] {name}: {'; '.join(bad_kinds)}")
            continue
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(
                    g, e, check_dtype=False, check_exact=False,
                    rtol=1e-9, atol=1e-9)
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
        if ok_schema and ok_rows and ok_vals:
            # strict: also check exact equality (what a hash would see)
            exact = True
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=True)
            except AssertionError:
                exact = False
            tag = "PASS      " if exact else "PASS~tol  "
            print(f"  [{tag}] {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
            why = ("schema " + str(list(g.columns)) + " vs " +
                   str(list(e.columns))) if not ok_schema else \
                  (f"rowcount {len(g)} vs {len(e)}" if not ok_rows else msg)
            print(f"  [FAIL      ] {name}: {why}")
    # Optional 3rd arg mirrors graft.Verify's prefix filter: when a
    # subset was run, only those prefixes are expected on disk.
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    missing = [k for k in oracle
               if not os.path.isdir(os.path.join(out_dir, k))
               and (prefixes is None
                    or any(k.startswith(p) for p in prefixes))]
    for k in sorted(missing):
        print(f"  [FAIL-miss ] {k}: no output written")
    n_fail += len(missing)
    if n_fail:
        # Self-diagnosis: graft.Verify writes the resolved oracle mode,
        # environment fingerprint, parallelism, and the pinned queries'
        # raw measured values next to the outputs — print them so a
        # hash FAIL carries its own evidence (VERDICT r10 ask #3).
        env_path = os.path.join(out_dir, "oracle_env.json")
        if os.path.exists(env_path):
            env = json.load(open(env_path))
            measured = env.pop("measured", {})
            print("oracle_env:", json.dumps(env, sort_keys=True))
            for k in sorted(measured):
                print(f"  measured[{k}]: {json.dumps(measured[k], sort_keys=True)}")
    print(f"{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
