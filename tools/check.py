#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query parquet in
OUTDIR, run the oracle SQL in DuckDB over the same testdata parquet tables and
compare (column-name-sorted) values row by row. Iteration tool only — the
shipped library is pure Scala/Spark."""
import sys, json, duckdb, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetch_arrow_table()
        exp = con.execute(sql).fetch_arrow_table()
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails += 1; continue
        gtypes = {c: str(got.schema.field(c).type) for c in gcols}
        etypes = {c: str(exp.schema.field(c).type) for c in ecols}
        if gtypes != etypes:
            # decimal-vs-integer is the round-4 q70/q77/q83 failure class:
            # str(Decimal('0')) == str(0) hides it from the stringify pass
            # below, but the driver's hash renders them differently. Any
            # decimal/integer pairing is therefore a hard FAIL here.
            def _isint(t): return t.startswith("int") or t.startswith("uint")
            hazard = [c for c in gcols
                      if ("decimal" in gtypes[c]) != ("decimal" in etypes[c])
                      and (_isint(gtypes[c]) or _isint(etypes[c]))]
            if hazard:
                print(f"FAIL {name}: decimal-vs-int on {hazard}: {gtypes} vs {etypes} "
                      f"(driver hashes decimal and int differently — CAST the oracle side)")
                fails += 1; continue
            print(f"WARN {name}: types {gtypes} vs {etypes}")
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} vs {exp.num_rows}"); fails += 1; continue
        g = [tuple(r[c] for c in gcols) for r in got.to_pylist()]
        e = [tuple(r[c] for c in ecols) for r in exp.to_pylist()]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:\n  got {a}\n  exp {b}"); fails += 1; continue
        # The driver's hash_match STRINGIFIES values before hashing, so a
        # value-equal pair can still fail (e.g. Decimal('221589.00') vs
        # 221589.0 — the round-1 root cause). Replicate that: compare str()
        # of every cell too.
        gs = [tuple(str(v) for v in row) for row in g]
        es = [tuple(str(v) for v in row) for row in e]
        sbad = [(i, a, b) for i, (a, b) in enumerate(zip(gs, es)) if a != b]
        if sbad:
            i, a, b = sbad[0]
            print(f"FAIL {name} [stringify]: {len(sbad)} rows differ as strings; first at {i}:\n  got {a}\n  exp {b}"); fails += 1; continue
        print(f"OK   {name} ({got.num_rows} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {ex}"); fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
