"""SparkSession factory with scale-oriented defaults.

The reference engine's runtime knobs (batch size 2048, concurrency 1, 8-way
download parallelism — reference: services/hbee/hbee_service.rs:22-24,
clients/range_cache.rs:120) are replaced here by Spark's own execution model;
the settings below are the ones that matter for a 100 TB deployment:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting).
- Arrow-batched Python exchange for the pandas-UDF operators.
- Partition-column type inference OFF so partition values stay strings, the
  reference's semantics (README.md:113 "partition values can only be strings").
- `maxPartitionBytes` at the 128 MiB default so one task ≈ one parquet
  row-group-sized split — the reference's one-file-per-worker fan-out
  (static_catalog.rs:95-107) generalized to byte-based splitting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "buzz-rust-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Python workers resolve pickled UDF references to this package by module
    # path; make sure the repo root is importable in worker processes.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Parquet TIMESTAMP(NANOS) (the events table) reads natively as
        # TIMESTAMP_NTZ in Spark 4 (micros truncation documented in SURVEY.md
        # §1.3); no legacy conf — sessions built here must behave identically
        # to the correctness driver's vanilla session.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("SPARK_GRAFT_S3", "") == "1":
        # S3A tuning for object-store catalogs (reference: region-scoped
        # ranged GETs + 8-way download parallelism, clients/s3.rs:19-55,
        # clients/range_cache.rs:120).  Gated behind an env flag because the
        # hadoop-aws jars are not shipped in every deployment (and never in
        # the local test container).  Per-bucket regions are applied by
        # StaticCatalog._apply_s3_conf at read time.
        s3_defaults = {
            # columnar range reads, the RangeCache access pattern
            "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
            "spark.hadoop.fs.s3a.readahead.range": "1M",
            "spark.hadoop.fs.s3a.connection.maximum": "96",
            "spark.hadoop.fs.s3a.threads.max": "64",
            "spark.hadoop.fs.s3a.fast.upload": "true",
            "spark.hadoop.fs.s3a.aws.credentials.provider": (
                "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider,"
                "com.amazonaws.auth.EnvironmentVariableCredentialsProvider"
            ),
        }
        region = os.environ.get("SPARK_GRAFT_S3_REGION")
        if region:
            s3_defaults["spark.hadoop.fs.s3a.endpoint.region"] = region
        for k, v in s3_defaults.items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
