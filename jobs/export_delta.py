#!/usr/bin/env python
"""spark-submit entrypoint: export the links added since a snapshot.

The handoff from the crawler to a downstream training-data pipeline:
each run reads ONLY the rows appended after the previously exported
snapshot (SnapTable.read_changes — Iceberg incremental-scan semantics),
writes them to the export directory, and records the new watermark
snapshot id, so every link is exported exactly once no matter how many
crawl cycles ran in between — without ever rescanning the table.

    spark-submit --py-files dist/spark_frontier.zip jobs/export_delta.py \\
        --store /path/to/warehouse --out /path/to/export \\
        [--table links] [--valid-only]

State: ``<out>/_last_snapshot`` holds the last exported snapshot id.
First run (no state) exports the full table. If a rewrite commit
(retention delete / compaction of the table) lands inside the window,
read_changes raises — the job then reports ``needs_full_export`` instead
of silently double-counting; rerun with ``--full`` to re-baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True, help="SnapStore warehouse root")
    p.add_argument("--out", required=True, help="export directory")
    p.add_argument("--table", default="links")
    p.add_argument("--valid-only", action="store_true",
                   help="export only validated article rows")
    p.add_argument("--full", action="store_true",
                   help="re-baseline: export the whole table")
    p.add_argument("--cores", type=int, default=0,
                   help="0 = inherit the spark-submit master")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from spark_frontier.storage import SnapStore

    builder = SparkSession.builder.appName("export-delta")
    if args.cores:
        builder = builder.master(f"local[{args.cores}]")
    spark = builder.getOrCreate()

    tbl = SnapStore(args.store).table(args.table)
    if not tbl.exists():
        print(json.dumps({"status": "empty_table", "table": args.table}))
        return 0

    state_path = os.path.join(args.out, "_last_snapshot")
    since = None
    if not args.full and os.path.exists(state_path):
        with open(state_path) as f:
            since = f.read().strip() or None

    head = tbl.snapshot_id
    if since == head:
        print(json.dumps({"status": "up_to_date", "snapshot": head}))
        return 0
    try:
        df = tbl.read(spark) if since is None else tbl.read_changes(
            spark, since)
    except ValueError as e:
        print(json.dumps({"status": "needs_full_export", "error": str(e)}))
        return 1
    if df is None:
        print(json.dumps({"status": "no_new_rows", "snapshot": head}))
    else:
        if args.valid_only and "is_valid" in df.columns:
            df = df.filter("is_valid")
        n = df.count()
        batch_dir = os.path.join(args.out, f"batch-{head}")
        df.write.mode("overwrite").parquet(batch_dir)
        print(json.dumps({"status": "exported", "rows": n,
                          "dir": batch_dir, "since": since,
                          "snapshot": head}))
    os.makedirs(args.out, exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(head)
    os.replace(tmp, state_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
