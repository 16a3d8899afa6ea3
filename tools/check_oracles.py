#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + <out>/oracle_sql.json), then this script
executes each oracle in DuckDB over the same fixture dir and compares
(column-name-sorted, row-sorted, exact values).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [only]
  only: optional comma-separated query names to check (default: all)
"""
import json, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows; normalize NaN/None for compare
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        want = {q.strip() for q in only.split(",")}
        oracles = {k: v for k, v in oracles.items() if k in want}
    passed, failed = [], []
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql)
            ocols = [d[0] for d in oracle.description]
            orows = oracle.fetchall()
            spark_sel = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            spark = con.execute(spark_sel)
            scols = [d[0] for d in spark.description]
            srows = spark.fetchall()
            # Physical widths must match too: the driver hashes via pandas,
            # where e.g. DuckDB HUGEINT (sum of ints) vs Spark BIGINT hash
            # differently even when values are equal. DB-API `description`
            # is BLIND to this (duckdb 1.0.0 stringifies every numeric as
            # 'NUMBER'), so compare pandas dtypes from .df() — the driver's
            # actual identity function.
            odt = con.execute(sql).df().dtypes
            sdt = con.execute(spark_sel).df().dtypes
            otypes = {c: str(odt[c]) for c in odt.index}
            stypes = {c: str(sdt[c]) for c in sdt.index}
            tdiff = {c: (stypes.get(c), otypes.get(c))
                     for c in set(otypes) | set(stypes)
                     if stypes.get(c) != otypes.get(c)}
            # nested-type detection still needs the logical types
            otypes_l = {d[0]: str(d[1]) for d in oracle.description}
            stypes_l = {d[0]: str(d[1]) for d in spark.description}
            oc, ocn = canon(orows, ocols)
            sc, scn = canon(srows, scols)
            # array/struct/map cells break the driver's pandas row sort
            nested = {c: t for c, t in {**stypes_l, **otypes_l}.items()
                      if "[]" in t or "STRUCT" in t or "MAP" in t or "LIST" in t}
            if nested:
                failed.append((name, f"nested-type result columns (driver can't sort): {nested}"))
            elif tdiff:
                failed.append((name, f"types differ (spark, oracle): {tdiff}"))
            elif ocn != scn:
                failed.append((name, f"cols differ: spark={scn} oracle={ocn}"))
            elif oc != sc:
                diff = next(((i, a, b) for i, (a, b) in enumerate(zip(oc, sc)) if a != b),
                            ("len", len(oc), len(sc)))
                failed.append((name, f"rows differ ({len(sc)} spark vs {len(oc)} oracle); first diff: {diff}"))
            else:
                passed.append((name, len(sc)))
        except Exception as e:
            failed.append((name, f"ERROR {str(e)[:200]}"))
    for name, n in passed:
        print(f"PASS {name} ({n} rows)")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(oracles)} total oracled")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
