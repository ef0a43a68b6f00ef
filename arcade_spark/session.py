"""SparkSession factory tuned for the encode/decode kernels.

Arrow batch size is pinned to the block size so each ``mapInPandas``
batch is one encode block (SURVEY.md §1: the reference's 65,535-row
block — arcade.h:25 — maps to an Arrow RecordBatch of ``BLOCK_ROWS``).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

from pyspark.sql import SparkSession

from arcade_spark import BLOCK_ROWS


def package_zip() -> str:
    """Zip the arcade_spark package for worker shipping — what
    ``spark-submit --py-files arcade_spark.zip`` does on a real
    cluster; ``get_spark`` attaches it automatically so driver scripts
    work from any cwd."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "arcade_spark_pkg.zip")
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "arcade_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    shutil.move(tmp, out)
    return out


def get_spark(
    app: str = "arcade-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str = "48g",
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n_shuffle = shuffle_partitions or (int(cores) if str(cores).isdigit() else 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(BLOCK_ROWS))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if os.path.isdir("/dev/shm"):
        # tmpfs shuffle spill: single-host sandbox proxy for a real
        # cluster's per-executor local disks (shared rotational /tmp
        # would serialize the shuffle across all workers)
        shuffle_dir = "/dev/shm/arcade-spark-local"
        os.makedirs(shuffle_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", shuffle_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    return spark
