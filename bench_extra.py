"""Round-6 optimization harness (bench.py is FROZEN; this file is the
builder's measurement sidecar per the optimization guide §1).

Modes:
  python bench_extra.py time  [--sf DIR] [--reps N] [--cpus N] q1 q2 ...
      Per-query wall time through the noop sink (min over reps),
      job-labelled, printed as one JSON line.
  python bench_extra.py plan  [--sf DIR] --out FILE q1
      Write df.explain("formatted") for the query to FILE.
  python bench_extra.py check [--sf DIR] q1 q2 ...
      STRICT oracle check vs DuckDB (exact values, not the 6-decimal
      mirror rounding): row count, column names, and multiset of rows
      with doubles compared bit-for-bit via repr.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(cpus: int):
    from xpshacl_spark.session import get_spark

    spark = get_spark(app_name="xpshacl-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_time(args) -> None:
    import __spark_entry__ as entry

    spark = _spark(args.cpus)
    qs = entry.queries()
    names = args.queries or list(qs)
    _force(spark.read.parquet(f"{args.sf}/region.parquet"))  # warm footers/JIT
    timings: dict[str, float] = {}
    for _ in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            _force(qs[name](spark, args.sf))
            el = time.monotonic() - t0
            timings[name] = round(min(el, timings.get(name, el)), 4)
    print(json.dumps({"sf_dir": args.sf, "cpus": args.cpus,
                      "reps": args.reps, "queries": timings,
                      "total": round(sum(timings.values()), 4)}))
    spark.stop()


def cmd_plan(args) -> None:
    import __spark_entry__ as entry

    spark = _spark(args.cpus)
    name = args.queries[0]
    df = entry.queries()[name](spark, args.sf)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"-- {name} @ {args.sf}\n")
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)} chars)")
    spark.stop()


def _norm_exact(v):
    if isinstance(v, float):
        return repr(v)  # bit-exact doubles
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    return v


def cmd_check(args) -> None:
    import duckdb

    import __spark_entry__ as entry

    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    spark = _spark(args.cpus)
    qs, osql = entry.queries(), entry.oracle_sql()
    names = args.queries or list(qs)
    con = duckdb.connect()
    for t in tables:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    for name in names:
        sdf = qs[name](spark, args.sf)
        srows = [tuple(_norm_exact(v) for v in r) for r in sdf.collect()]
        res = con.execute(osql[name])
        ocols = [d[0] for d in res.description]
        orows = [tuple(_norm_exact(v) for v in r) for r in res.fetchall()]
        scols = sdf.columns
        ok_cols = scols == ocols or sorted(scols) == sorted(ocols)
        if sorted(scols) == sorted(ocols) and scols != ocols:
            ix = [scols.index(c) for c in ocols]
            srows = [tuple(r[i] for i in ix) for r in srows]
        ok_rows = len(srows) == len(orows)
        ok_vals = sorted(srows, key=repr) == sorted(orows, key=repr)
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failed.append(name)
            diff_s = sorted(set(srows) - set(orows), key=repr)[:3]
            diff_o = sorted(set(orows) - set(srows), key=repr)[:3]
            print(f"{status} {name}: cols={ok_cols} rows={len(srows)}/"
                  f"{len(orows)} vals={ok_vals}\n  spark-only={diff_s}\n"
                  f"  oracle-only={diff_o}")
        else:
            print(f"{status} {name}: {len(srows)} rows exact-match")
    spark.stop()
    if failed:
        print("FAILED: " + ", ".join(failed))
        sys.exit(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plan", "check"])
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None)
    args = ap.parse_intermixed_args()
    {"time": cmd_time, "plan": cmd_plan, "check": cmd_check}[args.mode](args)


if __name__ == "__main__":
    main()
