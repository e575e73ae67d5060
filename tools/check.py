#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle
from <verifyOutDir>/oracle_sql.json, reads the Spark result parquet
from <verifyOutDir>/<name>/, and compares: columns sorted by name,
rows sorted, values stringified. Prints PASS/FAIL per query.
"""
import json
import sys
import glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        df[c] = df[c].map(lambda v: f"{v}")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def type_drift(con, sql, files):
    """Decimal/type drift the driver's hash is sensitive to but the
    stringified compare is not: report oracle-vs-spark arrow types that
    disagree (e.g. a bare DuckDB SUM(decimal) vs Spark decimal sum)."""
    import pyarrow.parquet as pq
    want = {f.name: str(f.type) for f in con.sql(sql).arrow().schema}
    sch = pq.read_schema(files[0])
    got = {n: str(sch.field(n).type) for n in sch.names}
    return [f"{c}: oracle={want[c]} spark={got[c]}"
            for c in sorted(set(want) & set(got)) if want[c] != got[c]]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark output")
            failed.append(name)
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            failed.append(name)
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failed.append(name)
        elif len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failed.append(name)
        elif not w.equals(g):
            diff = (w != g).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())} differing rows; first:")
            print("  want:", w[diff].head(2).to_dict("records"))
            print("  got: ", g[diff].head(2).to_dict("records"))
            failed.append(name)
        else:
            drift = type_drift(con, sql, files)
            if drift:
                print(f"PASS {name} ({len(g)} rows) TYPE-DRIFT: {'; '.join(drift)}")
            else:
                print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
