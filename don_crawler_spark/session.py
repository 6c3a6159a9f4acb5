"""SparkSession factory with the engine's scale-oriented defaults.

Local mode here stands in for a multi-executor cluster: partitioning,
AQE, and Arrow settings are chosen so the same plans hold at 1000
executors (see README "Scale notes").
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Make don_crawler_spark importable on executor Python workers.

    Pandas UDFs are pickled by reference to this module, so workers must
    import it. On a real cluster this is ``spark-submit --py-files
    don_crawler_spark.zip``; locally we build the same zip once per session
    and ``addPyFile`` it — identical code path, so the packaging story is
    exercised by every test run.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="don_crawler_spark_pyfiles_")
    zip_base = os.path.join(staging, "don_crawler_spark")
    archive = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir),
                                  os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(archive)


def get_spark(
    app_name: str = "don_crawler_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (fallback: all cores).
    ``shuffle_partitions`` defaults to 2x cpus locally; on a real cluster
    this would be sized to ~128MB of shuffle data per partition and AQE
    coalesces downward at runtime.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(32, 2 * cpus)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join splitting. At crawl scale a
        # heavy host (30%+ of the frontier) would otherwise serialize one
        # shuffle partition; AQE splits it, and our host-salting (see
        # plans/round.py) handles the politeness-partitioning path.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark
