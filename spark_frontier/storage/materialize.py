"""Lineage truncation with a cluster-safe mode (north_rule resumability).

``localCheckpoint(eager=True)`` stores blocks in executor memory/disk with
NO lineage to recompute from — fast, and correct in local mode (one JVM,
blocks die only with the whole job). On a multi-executor cluster a lost
executor means lost blocks AND no recompute path: the job dies. The
engine's durable state lives in SnapStore commits (Iceberg), so a dead
cycle is resumable from the last commit — but long cycles shouldn't die to
one executor loss in the first place.

``materialize(df)`` is the single switch point:

- default (local mode): ``localCheckpoint`` — zero-copy fast path.
- ``SPARK_FRONTIER_RELIABLE_CKPT=1`` (or any non-local master):
  ``df.checkpoint()`` to a RELIABLE checkpoint dir (HDFS/S3/NFS on a real
  cluster; set ``SPARK_FRONTIER_CKPT_DIR`` or it defaults to
  ``/tmp/spark_frontier_ckpt``). Blocks survive executor loss; tasks
  re-read from storage.

Failure model: with the flag on, an executor loss costs re-reading the
checkpoint files (no recompute); with it off (local mode) the process IS
the cluster, so block loss ⇔ job loss ⇔ resume-from-SnapStore anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_CKPT_DIR_SET = set()  # spark app ids with a checkpoint dir configured


def reliable_mode(spark) -> bool:
    if os.environ.get("SPARK_FRONTIER_RELIABLE_CKPT"):
        return True
    master = spark.sparkContext.master or ""
    return not master.startswith("local")


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage; storage-backed when running cluster-safe."""
    spark = df.sparkSession
    if reliable_mode(spark):
        sc = spark.sparkContext
        app_id = sc.applicationId
        if app_id not in _CKPT_DIR_SET:
            sc.setCheckpointDir(
                os.environ.get(
                    "SPARK_FRONTIER_CKPT_DIR", "/tmp/spark_frontier_ckpt"
                )
            )
            _CKPT_DIR_SET.add(app_id)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
