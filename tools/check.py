#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each SQL in DuckDB against views named after
the parquet tables in sfDir, and compares: row count, column names
(sorted), and cell values (column-name-sorted, row-sorted canonical hash).
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = repr(v)  # full precision: the driver compares exactly
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


def type_class(t):
    """Coarse Arrow type class. The driver's hash is TYPE-sensitive
    (round-1 lesson: DuckDB sum(int) -> HUGEINT, arrow decimal128, hash-
    mismatches Spark's int64 even with equal values). Normalize only
    representational differences (string vs large_string, tz presence),
    never width/kind differences."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    return str(t)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        st = pq.read_table(files[0])
        s_cols = st.column_names
        s_rows = [tuple(r.values()) for r in st.to_pylist()]
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows")
            continue
        try:
            dt = con.execute(oracle[name]).arrow()
            d_cols = dt.column_names
            d_rows = [tuple(r.values()) for r in dt.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_types = {f.name: type_class(f.type) for f in st.schema}
        d_types = {f.name: type_class(f.type) for f in dt.schema}
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif s_types != d_types:
            diffs = {c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types.get(c)}
            print(f"FAIL {name}: TYPE mismatch (spark, duck): {diffs}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            cs = canon(s_rows, s_cols)
            cd = canon(d_rows, d_cols)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(s_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
