#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries vs their DuckDB oracles.

Mimics the driver's correctness gate: runs each oracle SQL over the fixture
parquet tables, loads the Spark-written parquet for the same query, sorts
columns by name and rows by value, and diffs. Usage:

    python3 tools/localcheck.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon_type(t: pa.DataType) -> str:
    """Canonical dtype label for parity checks. The driver's hash is
    dtype-sensitive (see OpModule.scala output discipline), so integer
    widths/signedness and int-vs-float must match exactly between the
    Spark parquet and the oracle result. Only representation-level
    aliases are collapsed (utf8 vs large_utf8, dictionary encoding)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "utf8"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_dictionary(t):
        return canon_type(t.value_type)
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)  # int8..int64, uint*, float, double, bool

def dtype_mismatches(spark_tbl: pa.Table, ora_tbl: pa.Table):
    s = {f.name: canon_type(f.type) for f in spark_tbl.schema}
    o = {f.name: canon_type(f.type) for f in ora_tbl.schema}
    return [(c, s[c], o[c]) for c in sorted(set(s) & set(o)) if s[c] != o[c]]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to comparable primitives
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(outdir, sfdir, only=None):
    """only: optional set of query names — restrict the check to them
    (tools/sfsweep.py runs one query per subprocess so a long oracle can
    be timed out without killing the whole sweep)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    qdirs = [d for d in sorted(os.listdir(outdir))
             if os.path.isdir(os.path.join(outdir, d))
             and (only is None or d in only)]
    n_pass = n_fail = 0
    # a query that crashed in Verify writes no output dir at all — that is
    # a FAIL, not a skip (the driver's gate would record err for it).
    # Diff against the full executed list when Verify dumped one, so a
    # crashed ROWS-ONLY query (no oracle entry) is flagged too, not just
    # oracle-backed ones.
    exec_path = os.path.join(outdir, "executed_queries.json")
    expected = set(json.load(open(exec_path))) if os.path.exists(exec_path) \
        else set(oracle)
    if only is not None:
        expected &= set(only)
    for name in sorted(expected - set(qdirs)):
        print(f"FAIL {name}: no output dir (query crashed in Verify?)")
        n_fail += 1
    for name in qdirs:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_tbl = con.sql(
            f"SELECT * FROM read_parquet({files!r})").arrow()
        spark_df = spark_tbl.to_pandas()
        if name not in oracle:
            status = "rows-only"
            ok = len(spark_df) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name}: {status}, "
                  f"rows={len(spark_df)}")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            ora_tbl = con.sql(oracle[name]).arrow()
            ora_df = ora_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        bad_types = dtype_mismatches(spark_tbl, ora_tbl)
        if bad_types:
            for c, st, ot in bad_types:
                print(f"FAIL {name}: dtype mismatch on {c}: "
                      f"spark={st} vs oracle={ot}")
            n_fail += 1; continue
        a, b = canon(spark_df), canon(ora_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1
            continue
        # value-level compare with float tolerance
        mism = None
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(av.fillna(-9e99), bv.fillna(-9e99),
                                       rtol=1e-9, atol=1e-12):
                        mism = c; break
                else:
                    if not (av.fillna("\0N").astype(str)
                            .equals(bv.fillna("\0N").astype(str))):
                        mism = c; break
            except Exception as e:
                mism = f"{c} ({e})"; break
        if mism:
            print(f"FAIL {name}: column {mism} differs")
            bad = a[~a.astype(str).apply(tuple, 1)
                    .isin(b.astype(str).apply(tuple, 1))]
            print("  spark-only sample:\n", bad.head(3).to_string())
            bad2 = b[~b.astype(str).apply(tuple, 1)
                     .isin(a.astype(str).apply(tuple, 1))]
            print("  oracle-only sample:\n", bad2.head(3).to_string())
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(a)}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
