#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Verify dump.

STRICT by design (round-2 hardening): the round-1 version canonicalized
Decimal->float64 and stripped timezones, which masked exactly the four
mismatches the driver failed (m2/q1/q3/q4). This version:
  - compares arrow schemas exactly (decimal precision/scale, tz-awareness,
    int width) after column-name sort; any dtype difference is a FAIL
  - hash-compares values without coercion (floats compared exactly after
    both engines produce them; no rounding)
The local gate must never be green where the driver is red.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize_type(t: pa.DataType) -> pa.DataType:
    """Only differences that carry no information are erased: large_string vs
    string, large_list vs list. Decimal precision, timestamp tz, int width all
    stay significant."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_list(t):
        return pa.list_(normalize_type(t.value_type))
    if pa.types.is_list(t):
        return pa.list_(normalize_type(t.value_type))
    return t


def canon_table(tbl: pa.Table) -> pa.Table:
    tbl = tbl.select(sorted(tbl.column_names))
    fields = []
    cols = []
    for name in tbl.column_names:
        col = tbl.column(name).combine_chunks()
        nt = normalize_type(col.type)
        if nt != col.type:
            col = col.cast(nt)
        fields.append(pa.field(name, nt, nullable=True))
        cols.append(col)
    return pa.table(cols, schema=pa.schema(fields))


def sort_rows(tbl: pa.Table) -> pa.Table:
    keys = [(c, "ascending") for c in tbl.column_names]
    try:
        idx = pc.sort_indices(tbl, sort_keys=keys, null_placement="at_start")
        return tbl.take(idx)
    except pa.ArrowNotImplementedError:
        # unsortable column types (e.g. lists): sort by the sortable subset
        sortable = [c for c in tbl.column_names
                    if not (pa.types.is_list(tbl.column(c).type)
                            or pa.types.is_large_list(tbl.column(c).type)
                            or pa.types.is_binary(tbl.column(c).type))]
        if not sortable:
            return tbl
        idx = pc.sort_indices(tbl.select(sortable),
                              sort_keys=[(c, "ascending") for c in sortable],
                              null_placement="at_start")
        return tbl.take(idx)


def rows_repr(tbl: pa.Table, n=3):
    return [
        {c: tbl.column(c)[i].as_py() for c in tbl.column_names}
        for i in range(min(n, tbl.num_rows))
    ]


def compare(name: str, spark_tbl: pa.Table, duck_tbl: pa.Table) -> bool:
    a, b = canon_table(spark_tbl), canon_table(duck_tbl)
    if a.column_names != b.column_names:
        print(f"FAIL     {name}: columns {a.column_names} vs {b.column_names}")
        return False
    if a.schema != b.schema:
        diffs = [
            f"{f.name}: spark={a.schema.field(f.name).type} duck={b.schema.field(f.name).type}"
            for f in a.schema
            if a.schema.field(f.name).type != b.schema.field(f.name).type
        ]
        print(f"FAIL     {name}: schema mismatch — {'; '.join(diffs)}")
        return False
    if a.num_rows != b.num_rows:
        print(f"FAIL     {name}: rows {a.num_rows} vs {b.num_rows}")
        return False
    a, b = sort_rows(a), sort_rows(b)
    if not a.equals(b):
        # locate first differing row for the report
        shown = 0
        for i in range(a.num_rows):
            ra = {c: a.column(c)[i].as_py() for c in a.column_names}
            rb = {c: b.column(c)[i].as_py() for c in b.column_names}
            if ra != rb:
                if shown == 0:
                    print(f"FAIL     {name}: values differ; first rows:")
                print(f"  spark: {ra}")
                print(f"  duck:  {rb}")
                shown += 1
                if shown >= 3:
                    break
        if shown == 0:
            print(f"FAIL     {name}: tables differ (nested/NaN values)")
        return False
    print(f"PASS     {name} ({a.num_rows} rows)")
    return True


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.ParquetDataset(pdir).read()
            duck_tbl = con.execute(sql).fetch_arrow_table()
            if compare(name, spark_tbl, duck_tbl):
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"ERROR    {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
