#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the Verify.scala output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same testdata parquet, and
compares row count, schema (column names), and values (rows sorted by
all columns, exact equality; floats compared exactly to surface any
cross-engine nondeterminism early).

Usage: python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def type_family(arrow_type):
    """Collapse an Arrow type to the family the driver's hash is sensitive
    to. int widths <=64 hash identically (python ints) so they share a
    family, but DuckDB HUGEINT surfaces as decimal128 and is converted to
    float/object by pandas — a silent value-representation change. Flag it.
    """
    t = str(arrow_type)
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith(("int", "uint")):
        return "int"
    if t in ("float", "double", "halffloat"):
        return "float"
    if t in ("string", "large_string", "utf8", "large_utf8"):
        return "str"
    if t.startswith("list") or t.startswith("large_list"):
        return "list"
    return t


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            gt = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
            got_cols = list(gt.schema.names)
            got_types = {f.name: type_family(f.type) for f in gt.schema}
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            et = con.execute(sql).arrow()
            exp_cols = list(et.schema.names)
            exp_types = {f.name: type_family(f.type) for f in et.schema}
            exp = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"schema {sorted(got_cols)} != {sorted(exp_cols)}")
        else:
            type_diff = [
                f"{c}: spark={got_types[c]} oracle={exp_types[c]}"
                for c in sorted(got_cols) if got_types[c] != exp_types[c]]
            if type_diff:
                problems.append("type family mismatch "
                                f"[{'; '.join(type_diff)}]")
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if not problems:
            # driver sorts columns by name; replicate
            gidx = [got_cols.index(c) for c in sorted(got_cols)]
            eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
            def key(row):
                return tuple((v is None, str(v)) for v in row)
            g = sorted((tuple(canon(r[i]) for i in gidx) for r in got), key=key)
            e = sorted((tuple(canon(r[i]) for i in eidx) for r in exp), key=key)
            bad = [(a, b) for a, b in zip(g, e) if a != b]
            if bad:
                problems.append(f"values differ in {len(bad)}/{len(g)} rows; "
                                f"first: {bad[0][0]} != {bad[0][1]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
