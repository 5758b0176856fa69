#!/usr/bin/env python
"""Dev-only local mirror of the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
testdata parquet tables and compares with the Spark result parquet in
<outdir>/<name>/. Columns are sorted by name before comparison (like the
driver), rows compared exactly after sorting.

Usage: python tools/check_oracle.py <sfdir> <outdir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails, passes, skips = [], [], []
for name, sql in sorted(oracle.items()):
    resdir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(resdir, "*.parquet"))
    if not files:
        fails.append((name, "no spark result written"))
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle sql failed: {e}"))
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{resdir}/*.parquet')").fetchdf()
    # driver semantics: sort columns by name, then compare
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"columns: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        fails.append((name, f"rows: oracle={len(exp)} spark={len(got)}"))
        continue
    # the driver's checker lexsorts every column and CRASHES on
    # array-typed cells ("unhashable type: numpy.ndarray") — detect
    # that shape here and fail loudly so it never reaches the driver
    bad = [c for c in exp.columns
           if any(isinstance(v, (list, tuple))
                  or type(v).__name__ == "ndarray"
                  for df in (exp, got)
                  for v in df[c].head(3))]
    if bad:
        fails.append((name, f"array-typed gate output column(s) {bad}: "
                      "the driver's checker cannot sort these — emit "
                      "scalar-only columns (explode or concat_ws)"))
        continue
    # the driver HASHES values including dtype: an int64 Spark column vs
    # a float64 oracle column (e.g. DuckDB HUGEINT window sum fetched by
    # pandas as float64) hash-mismatches even when values are equal.
    # Normalize dtypes to int/float/bool/datetime/object families and
    # fail on any cross-family pair so the local mirror matches the
    # driver (the r14 pa2/pa7/pa8 bug class).
    def family(dt):
        k = dt.kind  # numpy kind: i/u int, f float, b bool, M datetime
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "datetime"}.get(k, "object")
    dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
              for c in exp.columns
              if family(exp[c].dtype) != family(got[c].dtype)]
    if dt_bad:
        fails.append((name, f"dtype family mismatch (driver hashes "
                      f"dtypes): {dt_bad[:3]} — cast the oracle (e.g. "
                      "CAST(sum(...) OVER (...) AS BIGINT)) or the "
                      "Spark column so both sides agree"))
        continue
    sortcols = list(exp.columns)
    e = exp.sort_values(sortcols).reset_index(drop=True)
    g = got.sort_values(sortcols).reset_index(drop=True)
    diff_cols = []
    for c in e.columns:
        ev, gv = e[c], g[c]
        same = (ev.fillna("__NA__") == gv.fillna("__NA__")).all() \
            if ev.dtype == object else \
            ((ev.isna() & gv.isna()) | (ev == gv)).all()
        if not same:
            idx = None
            for i in range(len(ev)):
                a, b = ev.iloc[i], gv.iloc[i]
                if (a != b) and not (a != a and b != b):
                    idx = i
                    break
            diff_cols.append((c, idx,
                              None if idx is None else ev.iloc[idx],
                              None if idx is None else gv.iloc[idx]))
    if diff_cols:
        fails.append((name, f"value diff: {diff_cols[:3]}"))
    else:
        passes.append(name)

# queries without oracle → rows-only
for resdir in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(resdir)
    if not os.path.isdir(resdir) or name in oracle:
        continue
    n = len(con.execute(
        f"SELECT * FROM read_parquet('{resdir}/*.parquet')").fetchdf())
    skips.append((name, n))

print(f"PASS {len(passes)}: {passes}")
for name, n in skips:
    print(f"ROWS-ONLY {name}: {n} rows")
if fails:
    print(f"FAIL {len(fails)}:")
    for name, why in fails:
        print(f"  {name}: {why}")
    sys.exit(1)
print("ALL OK")
