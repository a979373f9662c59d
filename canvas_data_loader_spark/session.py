"""SparkSession construction tuned for this engine.

Local-mode defaults follow the Spark docs' guidance: shuffle partitions
sized to cores (not the 200 default), AQE on for runtime re-planning and
skew-join handling, Arrow on for the Pandas-UDF slow path, UTC session
timezone so results are comparable with UTC-naive oracles (DuckDB).

At cluster scale the same builder applies — only master/memory change;
AQE + coalescePartitions make the shuffle-partition number a ceiling
rather than a fixed fanout, which is what you want at 100 TB.
"""

from __future__ import annotations

import os

# Pin BLAS to one thread per process BEFORE numpy loads anywhere
# (driver or Python workers, which inherit this env in local mode).
# Two reasons: (a) 32 parallel Python workers each spinning up an
# OpenBLAS pool oversubscribes the box 32x; (b) this container's
# OpenBLAS threaded dgemm pays ~2s of handshake overhead on EVERY
# large call (measured), while the single-threaded path is ~0.01s.
# Vectorized operators additionally block their matmuls (see
# operators/simsearch.py) so no single BLAS call crosses the
# large-buffer slow path.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "canvas_data_loader_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or int(DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the cdl_warehouse batch reader implements
        # DataSourceReader.pushFilters (bucket + stats file pruning);
        # Spark refuses such a reader outright when this conf is off,
        # so the engine session enables it (sessions built elsewhere
        # either set it too or read with .option("pushdown", "false"))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Local-mode split sizing: the test fixtures are single ~20 MB
        # parquet files, which at the default 128 MB split = ONE scan
        # task on a 32-core box (measured by tools/scale_probe.py: 10x
        # the data ran FASTER because it shipped as 32 files). 4 MB
        # splits parallelize the small-file scans; on a real cluster
        # against TB inputs the default is correct — this override is
        # keyed to local mode only.
        .config("spark.sql.files.maxPartitionBytes", "4m" if master.startswith("local") else "128m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
