"""SparkSession helpers tuned for this engine.

Local-mode testing uses local[N]; the same code runs unchanged on a real
cluster (partitioning via repartition-by-routing-key, no driver-side loops).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark(
    cores: int | str = "*",
    shuffle_partitions: int = 32,
    app_name: str = "elasticsearch_spark",
    master: str | None = None,
) -> SparkSession:
    """SparkSession on local[cores], or any explicit ``master`` — e.g.
    ``local-cluster[4,8,8192]`` for multi-executor (separate JVM) runs used
    by the scaling evidence."""
    # make the package importable in python workers
    existing = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + existing if existing else "")
        )
    if master and master.startswith("local-cluster"):
        os.environ.setdefault("SPARK_HOME", os.path.dirname(
            __import__("pyspark").__file__))
    return (
        SparkSession.builder.master(master or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local-mode driver hosts all task threads — at 32 threads an 8g heap
        # GC-thrashes (measured 3x slowdown); size generously
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # UI off by default (test noise); SPARK_GRAFT_UI=true exposes the
        # REST task-metrics API for the occupancy evidence scripts
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .getOrCreate()
    )
