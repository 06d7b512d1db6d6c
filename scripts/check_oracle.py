#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the library).

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet dumped by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf parquet tables,
sorts columns by name + rows by all columns, and compares values exactly.

Also TYPE-STRICT: the driver's hasher distinguishes value types (q46 round
5 failed solely because DuckDB widens SUM(BIGINT) to HUGEINT while Spark
writes int64), and Python-level comparison coerces that away — so each
column's DuckDB type is compared between the Spark parquet result and the
oracle result, with HUGEINT/BIGINT-class mismatches failing the check.
"""
import sys, os, json
import duckdb

# DuckDB type names that hash identically on the driver, calibrated
# against CORRECTNESS_r05's observed behavior: int widths up to 64 bits
# coerce before hashing (q11/q44/vec01-08 pass with Spark INTEGER
# row_number vs DuckDB BIGINT ROW_NUMBER), but HUGEINT does NOT (q46's
# uncast SUM(BIGINT) was the round's one hash failure). Anything else
# differing is a failure.
_EQUIV = [
    {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"},  # NOT HUGEINT
    {"VARCHAR"},
    {"DOUBLE"},  # FLOAT is NOT equivalent: 4-byte vs 8-byte
]

def types_match(a, b):
    if a == b:
        return True
    return any(a in g and b in g for g in _EQUIV)

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
    out = []
    for r in rows:
        cr = []
        for v in r:
            if isinstance(v, float):
                cr.append(('f', repr(v)))
            else:
                cr.append((type(v).__name__, str(v)))
        out.append(tuple(cr))
    out.sort()
    return out

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_cols = sorted(got.columns)
        got_proj = got.project(', '.join(got_cols))
        got_rows = got_proj.fetchall()
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(got_rows)} rows)"
                  + ("  !! EMPTY" if not got_rows else ""))
            continue
        try:
            exp = con.sql(oracle[name])
            exp_cols = sorted(exp.columns)
            exp_proj = exp.project(', '.join(exp_cols))
            exp_rows = exp_proj.fetchall()
        except Exception as e:
            print(f"  X {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"  X {name}: COLUMN MISMATCH got={got_cols} exp={exp_cols}")
            n_fail += 1
            continue
        type_errs = [
            f"{c}: spark={str(tg)} oracle={str(te)}"
            for c, tg, te in zip(got_cols, got_proj.types, exp_proj.types)
            if not types_match(str(tg), str(te))]
        if type_errs:
            print(f"  X {name}: TYPE MISMATCH (driver hash distinguishes): "
                  + "; ".join(type_errs))
            n_fail += 1
            continue
        cg, ce = canon(got_rows), canon(exp_rows)
        if cg == ce:
            print(f"  + {name}: OK ({len(cg)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  X {name}: VALUE MISMATCH got {len(cg)} rows exp {len(ce)} rows")
            diff = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
            for a, b in diff:
                print(f"      got {a}\n      exp {b}")
            only_g = [r for r in cg if r not in set(ce)][:2]
            only_e = [r for r in ce if r not in set(cg)][:2]
            if only_g: print(f"      only-in-got: {only_g}")
            if only_e: print(f"      only-in-exp: {only_e}")
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
