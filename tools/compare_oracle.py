#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>
       python3 tools/compare_oracle.py --types-only <oracle_sql.json> <sf_dir>

For each query dir under verify_out: load the Spark parquet result, run
the matching oracle SQL from oracle_sql.json against views named after
the test tables, sort columns by name, sort rows, compare cell-by-cell
(floats to 1e-9 rel tolerance, timestamps/dates stringified).

TYPE-FAITHFUL: the driver hashes TYPED values, so an oracle column that
widens past what Spark can emit (DuckDB HUGEINT from windowed
sum(BIGINT), DECIMAL from exact arithmetic) hash-mismatches even when
every stringified cell is identical — the round-9 q_kaplan_meier /
q_nelson_aalen miss. Every oracle result's dtypes are therefore
asserted against the allowed scalar set; anything widened FAILS here
before it fails at the driver. --types-only sweeps just the oracle SQL
(no Spark run needed).
"""
import sys, os, json, math
import duckdb

# Types Spark parquet output can carry; a DuckDB oracle emitting
# anything else (HUGEINT, DECIMAL, UINTEGER, ...) cannot hash-match.
ALLOWED_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "FLOAT",
                 "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN",
                 "TIMESTAMP WITH TIME ZONE"}

def bad_types(rel):
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) not in ALLOWED_TYPES]

def types_only(oracle_path, sf_dir):
    con = duckdb.connect()
    for tname in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for q, sql in sorted(oracle.items()):
        try:
            bad = bad_types(con.sql(sql))
        except Exception as e:
            print(f"FAIL {q}: oracle error: {e}")
            n_bad += 1
            continue
        if bad:
            print(f"FAIL {q}: widened dtypes {bad}")
            n_bad += 1
    print(f"== types-only sweep: {len(oracle)} oracles, {n_bad} widened ==")
    sys.exit(1 if n_bad else 0)

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main():
    if sys.argv[1] == "--types-only":
        types_only(sys.argv[2], sys.argv[3])
        return
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tname in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
        if q not in oracle:
            print(f"ROWS-ONLY {q}: {len(srows)} rows")
            n_rowsonly += 1
            continue
        try:
            orel = con.sql(oracle[q])
            bad = bad_types(orel)
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"FAIL {q}: oracle error: {e}")
            n_fail += 1
            continue
        if bad:
            print(f"FAIL {q}: oracle emits widened dtypes {bad} "
                  f"(typed hash cannot match Spark)")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {q}: schema {sc} vs oracle {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(f"FAIL {q}: rowcount {len(sr)} vs {len(orr)}")
            n_fail += 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {q}: value mismatch, e.g. {diffs}")
            n_fail += 1
        else:
            print(f"PASS {q}: {len(sr)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
