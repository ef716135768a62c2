#!/usr/bin/env python3
"""Local conformance check: compare Verify.scala parquet dumps against
the DuckDB oracle, mimicking the driver's compare (sort columns by
name, sort rows, compare values with float rounding).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout q1 q2" &&
  python3 dev/check.py /tmp/vout /root/testdata/sf0.01 q1 q2
"""
import duckdb, json, glob, os, sys


def compare(outdir, sfdir, names):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        t = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    ok = True
    for name in names:
        if name not in oracle:
            print(f"{name}: NO ORACLE (rows-only check)")
            continue
        sp = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetchdf()
        orc = con.execute(oracle[name]).fetchdf()
        sp = sp.reindex(sorted(sp.columns), axis=1)
        orc = orc.reindex(sorted(orc.columns), axis=1)
        status = []
        if len(sp) != len(orc):
            status.append(f"rows {len(sp)} vs {len(orc)}")
        if list(sp.columns) != list(orc.columns):
            status.append(f"cols {list(sp.columns)} vs {list(orc.columns)}")
        if not status:
            def norm(df):
                rows = []
                for row in df.itertuples(index=False):
                    vals = []
                    for v in row:
                        if isinstance(v, float):
                            vals.append("NaN" if v != v else round(v, 6))
                        elif hasattr(v, "tolist"):
                            vals.append(tuple(v.tolist()) if hasattr(v, "__len__") else v.item())
                        else:
                            vals.append(v)
                    rows.append(tuple(vals))
                return sorted(rows, key=repr)
            a, b = norm(sp), norm(orc)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"values differ, e.g. {diffs}")
        if status:
            ok = False
            print(f"{name}: FAIL ({'; '.join(status)})")
        else:
            print(f"{name}: OK ({len(sp)} rows)")
    return ok


if __name__ == "__main__":
    outdir, sfdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [
        os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d)
    ]
    sys.exit(0 if compare(outdir, sfdir, sorted(names)) else 1)
