#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf parquet dir and diff against the Spark parquet dumps
written by graft.Verify. Usage: compare.py <sfDir> <verifyOutDir>.

Comparison: sort columns by name, round doubles to 6 significant digits,
sort rows, compare cell-by-cell (mirrors the driver policy described in
BASELINE.md: normalize decimal scale, order-insensitive)."""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    # dates/timestamps/decimals → str
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.sql(sql)
            dcols = [c.lower() for c in duck.columns]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        sp = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        scols = [c.lower() for c in sp.columns]
        srows = sp.fetchall()
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns {sorted(scols)} vs oracle {sorted(dcols)}")
            n_fail += 1
            continue
        _, dn = norm_rows(dcols, drows)
        _, sn = norm_rows(scols, srows)
        if dn == sn:
            print(f"PASS {name} ({len(sn)} rows)")
            n_pass += 1
        else:
            detail = (f"row counts {len(sn)} vs {len(dn)}"
                      if len(sn) != len(dn) else "cell contents differ")
            print(f"FAIL {name}: {detail}")
            only_s = [r for r in sn if r not in dn][:3]
            only_d = [r for r in dn if r not in sn][:3]
            print(f"  spark-only: {only_s}")
            print(f"  duck-only:  {only_d}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
