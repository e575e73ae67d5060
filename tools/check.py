#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle
from <verifyOutDir>/oracle_sql.json, reads the Spark result parquet
from <verifyOutDir>/<name>/, and compares AT ARROW LEVEL: columns
sorted by name, rows sorted, values via arrow .as_py() (Decimal stays
Decimal — no float64 downcast, so sub-float diffs the driver's hash
sees are visible here too). Prints PASS/FAIL per query.
"""
import json
import sys
import glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_arrow(tbl):
    """Arrow table -> (sorted col names, sorted tuples of value strings).
    str() of the .as_py() value keeps decimal digits exact (Decimal),
    distinguishes 267 from 268 cents, and is total-orderable."""
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(str(col[i]) for col in data)
                  for i in range(tbl.num_rows))
    return cols, rows


def type_drift(want_tbl, files):
    """Report oracle-vs-spark arrow types that disagree (e.g. a bare
    DuckDB SUM(decimal) widening vs Spark's sum) — the driver checks
    schema separately from values, so surface it even when values match."""
    import pyarrow.parquet as pq
    want = {f.name: str(f.type) for f in want_tbl.schema}
    sch = pq.read_schema(files[0])
    got = {n: str(sch.field(n).type) for n in sch.names}
    return [f"{c}: oracle={want[c]} spark={got[c]}"
            for c in sorted(set(want) & set(got)) if want[c] != got[c]]


def main(sf_dir, out_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING {name}: no spark output")
            failed.append(name)
            continue
        try:
            want_tbl = con.sql(sql).arrow()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            failed.append(name)
            continue
        got_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        wc, wr = norm_arrow(want_tbl)
        gc, gr = norm_arrow(got_tbl)
        if wc != gc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            failed.append(name)
        elif len(wr) != len(gr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            failed.append(name)
        elif wr != gr:
            bad = [(w, g) for w, g in zip(wr, gr) if w != g]
            print(f"FAIL {name}: {len(bad)} differing rows; first:")
            for w, g in bad[:2]:
                print("  want:", dict(zip(wc, w)))
                print("  got: ", dict(zip(gc, g)))
            failed.append(name)
        else:
            drift = type_drift(want_tbl, files)
            if drift:
                print(f"PASS {name} ({len(gr)} rows) TYPE-DRIFT: {'; '.join(drift)}")
            else:
                print(f"PASS {name} ({len(gr)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
