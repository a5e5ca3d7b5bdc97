#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run the oracle SQL in DuckDB over the same sf dir,
sort columns by name + rows, and compare values. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir> [skip1,skip2,...]
The optional third arg skips named queries (e.g. oracles that are
all-pairs in SQL and quadratic at larger scale factors).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
# Verify records dump-time exceptions here; fold them in as failures so
# a query that crashed cannot silently shrink the N/N denominator. A
# failed dump wins over any stale/partial parquet dir of the same name.
fail_path = os.path.join(out_dir, "_failures.json")
dump_failed = json.load(open(fail_path)) if os.path.exists(fail_path) else {}
for name, msg in dump_failed.items():
    if name not in skip:
        results[name] = {"check": "dump_failed", "ok": False, "err": msg}
skip = skip | set(dump_failed)
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d) or name in skip:
        continue
    files = glob.glob(f"{d}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        results[name] = {"rows": len(spark_df), "check": "rows_only",
                         "ok": len(spark_df) > 0}
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = {"check": "oracle_error", "ok": False, "err": str(e)[:200]}
        continue
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    dk = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    schema_match = list(s.columns) == list(dk.columns)
    rows_match = len(s) == len(dk)
    # dtype KIND audit (int vs float vs other): the driver stringifies
    # values without float canonicalization, so a DuckDB HUGEINT (an
    # uncast integer SUM -> pandas float64, "643.0") hash-mismatches a
    # Spark int64 ("643") even when the values are equal. Treat a kind
    # mismatch as a failure HERE so the local gate is at least as
    # strict as the driver's (the r7/r8 q36/d15 lesson).
    def kind(col):
        dt = col.dtype
        if pd.api.types.is_bool_dtype(dt): return "bool"
        if pd.api.types.is_integer_dtype(dt): return "int"
        if pd.api.types.is_float_dtype(dt): return "float"
        if pd.api.types.is_datetime64_any_dtype(dt): return "ts"
        if dt == object:
            # Spark DATE columns arrive as object-of-datetime.date;
            # the driver's gate treats those equal to DuckDB's
            # datetime64 (q08/q09/q16/q27 pass every round), so do we
            import datetime
            nn = col.dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date):
                return "ts"
        return "other"
    dtype_mismatch = [
        f"{c}: spark={s[c].dtype} duck={dk[c].dtype}"
        for c in (s.columns if schema_match else [])
        if kind(s[c]) != kind(dk[c])]
    hash_match = False
    detail = ""
    if schema_match and rows_match:
        # normalize: sort rows by all columns, stringify values
        def norm(df):
            df = df.copy()
            for c in df.columns:
                if pd.api.types.is_datetime64_any_dtype(df[c]):
                    df[c] = df[c].astype("datetime64[us]").astype(str)
                elif pd.api.types.is_float_dtype(df[c]):
                    df[c] = df[c].map(lambda x: f"{x:.10g}")
                else:
                    df[c] = df[c].astype(str)
            return df.sort_values(list(df.columns)).reset_index(drop=True)
        ns, nd = norm(s), norm(dk)
        hash_match = ns.equals(nd)
        if not hash_match:
            diff = ns.compare(nd) if ns.shape == nd.shape else None
            detail = str(diff.head(5)) if diff is not None else "shape"
    results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                     "hash_match": hash_match,
                     "ok": hash_match and not dtype_mismatch,
                     "spark_rows": len(s), "duck_rows": len(dk)}
    if dtype_mismatch:
        results[name]["dtype_mismatch"] = dtype_mismatch
    if detail:
        results[name]["diff"] = detail
    if not schema_match:
        results[name]["spark_cols"] = list(s.columns)
        results[name]["duck_cols"] = list(dk.columns)

ok = sum(1 for r in results.values() if r.get("ok"))
print(json.dumps(results, indent=1, default=str))
print(f"\n== {ok}/{len(results)} ok ==")
