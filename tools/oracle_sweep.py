"""Full driver-style oracle sweep: run EVERY __ray_entry__.queries()
entry against its oracle_sql() on one sf directory and report
per-query row/schema/value equality — the same canonicalization the
grading harness uses (columns sorted by name, rows sorted by all
columns, NaN-safe value compare).

Usage:
    python tools/oracle_sweep.py [--sf-dir /root/testdata/sf0.01] [-v]

Exit code 0 iff every oracled query matches. Run this BEFORE shipping
operator changes: tests/test_driver_parity.py covers sf0.001 only, and
threshold-sensitive queries can diverge only at other scales.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("documents", "embeddings", "events", "lineitem", "orders",
          "customer", "part", "supplier", "nation", "region")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--only", help="comma-separated query names")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            "create view %s as select * from read_parquet('%s/%s.parquet')"
            % (t, args.sf_dir, t)
        )

    def to_df(x):
        if isinstance(x, rd.Dataset):
            return x.to_pandas()
        if isinstance(x, pa.Table):
            return x.to_pandas()
        return x

    def canon(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    qs, sqls = m.queries(), m.oracle_sql()
    names = sorted(sqls)
    # golden parquet oracles are pinned to sf0.01 (the grading scale);
    # at other scales they legitimately mismatch — skip them there
    golden = set(m._golden_sql())
    if os.path.basename(os.path.normpath(args.sf_dir)) != "sf0.01":
        skipped = [n for n in names if n in golden]
        if skipped:
            print("skipping %d golden-backed queries (pinned to sf0.01): %s"
                  % (len(skipped), ", ".join(skipped)))
        names = [n for n in names if n not in golden]
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    fails = []
    for name in names:
        try:
            mine = canon(to_df(qs[name](args.sf_dir)))
            want = canon(con.sql(sqls[name]).df())
            if list(mine.columns) != list(want.columns):
                fails.append((name, "schema", list(mine.columns), list(want.columns)))
                status = "SCHEMA"
            elif len(mine) != len(want):
                fails.append((name, "rows", len(mine), len(want)))
                status = "ROWS"
            else:
                mm = mine.astype(object).where(pd.notna(mine), None).values.tolist()
                ww = want.astype(object).where(pd.notna(want), None).values.tolist()
                if mm != ww:
                    fails.append((name, "values"))
                    status = "VALUES"
                else:
                    status = "OK"
            if args.verbose or status != "OK":
                print("%-28s %6d rows  %s" % (name, len(mine), status), flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            fails.append((name, "error", repr(e)[:200]))
            print("%-28s ERROR %s" % (name, repr(e)[:160]), flush=True)
    ray.shutdown()
    print("sweep: %d/%d oracled queries match (%s)"
          % (len(names) - len(fails), len(names), args.sf_dir))
    if fails:
        for f in fails:
            print("FAIL:", f)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
