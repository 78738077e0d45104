#!/usr/bin/env python3
"""Audit every oracle SQL's FINAL column types against OracleIdioms
rule 1: no HUGEINT / DECIMAL / UBIGINT may be emitted (they convert
differently across DuckDB/pyarrow versions — the round-9 q174/q186/
q197/q207 and round-10 q235 failure class; q235's `bin` was an uncast
windowed-sum `//` quotient, i.e. HUGEINT, bit-exact on DuckDB 1.0.0
and red in the driver's newer build).

Usage: python3 tools/oracle_type_audit.py [oracle_sql.json] [sfDir]
Run after any oracle change; exits 1 on any flagged column.
"""
import json, sys

import duckdb

ORACLE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify/oracle_sql.json"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "DECIMAL", "UBIGINT")

sql = json.load(open(ORACLE))
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

flagged = []
for q in sorted(sql):
    try:
        rel = con.sql(sql[q])
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if any(b in str(t) for b in BANNED)]
        if bad:
            flagged.append((q, bad))
    except Exception as e:
        flagged.append((q, f"ERR {str(e)[:100]}"))

for f in flagged:
    print("FLAG", *f)
print(f"{len(sql)} oracles audited, {len(flagged)} flagged")
sys.exit(1 if flagged else 0)
