#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same sf tables; compare schema + values
with columns sorted by name. Usage: check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


# Driver-hasher portability (VERDICT r10 task 2 / r12 task 2): the driver
# canonicalizes wide integers and decimals differently between parquet and
# DuckDB's native serializer — x110 (DECIMAL(38,0), Spark side, r10) and
# x134 (HUGEINT, oracle side, r12) were both value-exact rows that hashed
# apart on type alone. SchemaConventionSpec pins the Spark side; this pins
# the oracle side: DESCRIBE every oracle and fail on any non-portable
# result column type. Exact wide arithmetic INSIDE a query is fine — only
# the result schema must land in the portable set.
NON_PORTABLE = ("HUGEINT", "UHUGEINT", "DECIMAL")


def audit_oracle_types(con, oracle):
    offenders = []
    for name in sorted(oracle):
        try:
            cols = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            offenders.append((name, "<describe failed>", str(e)))
            continue
        for cname, ctype, *_ in cols:
            if any(t in ctype.upper() for t in NON_PORTABLE):
                offenders.append((name, cname, ctype))
    for name, cname, ctype in offenders:
        print(f"TYPEFAIL {name}: column {cname} has non-portable oracle type {ctype}")
    return offenders


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    type_offenders = audit_oracle_types(con, oracle)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got_rel = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        e = [tuple(norm(r[i]) for i in ei) for r in exp]
        if len(g) != len(e):
            print(f"FAIL {name}: {len(g)} rows vs {len(e)}")
            n_fail += 1
            continue
        if g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: first diff at row {bad}:\n  got {g[bad]}\n  exp {e[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(type_offenders)} oracle type offenders ==")
    return 1 if (n_fail or type_offenders) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
