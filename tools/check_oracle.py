#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (column-name-sorted,
row-sorted) values. Usage: check_oracle.py <sfDir> <verifyOutDir>
[qPrefix[,qPrefix...]] — the optional third arg checks only matching
queries (pair with Verify's same filter when iterating on one query).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)

# Deliberate cross-engine equivalences ONLY — calibrated against what the
# driver's hasher actually tolerates (r1-r7 evidence): machine-int widths
# collapse (q31/q32/q46/q54/q66 ship Spark INTEGER vs DuckDB BIGINT and
# have always hash-matched — both convert to the same Python int), and
# timestamp/VARCHAR spellings collapse. HUGEINT does NOT collapse: DuckDB's
# int128 SUM result leaves the machine-int domain in the arrow/pandas
# conversion and broke q97's hash in r7 while being value-identical.
import re
def norm_type(t):
    t = t.upper()
    t = re.sub(r"TIMESTAMP(_NS|_MS|_S)?( WITH TIME ZONE)?", "TIMESTAMP", t)
    t = re.sub(r"\b(STRING|TEXT)\b", "VARCHAR", t)
    t = re.sub(r"\bREAL\b", "FLOAT", t)
    t = re.sub(r"\b(TINYINT|SMALLINT|INTEGER)\b", "BIGINT", t)
    return t

def coltypes(con, query):
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: norm_type(r[1]) for r in rows}

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            failures += 1
            continue
        try:
            got_types = coltypes(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            exp_types = coltypes(con, sql)
            bad = {c: (got_types.get(c), exp_types.get(c))
                   for c in got_cols
                   if got_types.get(c) != exp_types.get(c)}
            if bad:
                print(f"FAIL {name}: column TYPES diverge {bad} "
                      f"(driver hash is type-sensitive)")
                failures += 1
                continue
            # The driver hashes via pandas sort_values, which dies on
            # unhashable cells (dict/list). Any nested output type is a
            # guaranteed driver `err` even when values match — refuse it
            # here so the replica is never MORE permissive than the gate
            # it replicates (q117 shipped red in r10 exactly this way).
            # list detection must catch BOTH spellings DuckDB renders:
            # variable-size LIST as `T[]` and fixed-size ARRAY as `T[3]`
            nested = {c: t for c, t in got_types.items()
                      if t.startswith(("STRUCT", "MAP")) or "[]" in t
                      or re.search(r"\[\d*\]", t)
                      or t.startswith("UNION")}
            if nested:
                print(f"FAIL {name}: nested output types {nested} — the "
                      f"driver's pandas hasher cannot sort these; flatten "
                      f"the final projection to scalars")
                failures += 1
                continue
        except Exception as e:
            print(f"WARN {name}: type check skipped: {e}")
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got)
        e = sorted(tuple(norm(r[i]) for i in ei) for r in exp)
        if g == e:
            print(f"OK   {name}: {len(g)} rows")
        else:
            failures += 1
            diff_g = [r for r in g if r not in set(e)][:3]
            diff_e = [r for r in e if r not in set(g)][:3]
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}; "
                  f"got-only={diff_g} exp-only={diff_e}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sys.exit(1 if main(sys.argv[1], sys.argv[2], only) else 0)
