"""SparkSession factory.

Tuned for the sandbox (local[N], single JVM) but every knob is the one
you'd set on a 1000-executor cluster: AQE on (skew-join splitting +
dynamic coalescing), Arrow on (all custom logic is pandas-UDF
vectorized — input_hint forbids per-row Python), shuffle partitions
sized ~2-3x cores and overridable per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scrapy-cluster-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cores`` may be an int (→ local[n]) or a full master string.  The
    driver's bench harness varies this to evidence N→4N scaling
    (BASELINE.json north_rule) as local[8] vs local[32].
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = cores if isinstance(cores, str) and cores.startswith(("local", "spark")) else f"local[{cores}]"
    n_cores = 32
    try:
        n_cores = int(str(cores).replace("local[", "").rstrip("]").replace("*", "32"))
    except ValueError:
        pass
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n_cores, 8)

    local_dir = None
    if os.path.isdir("/dev/shm") and not (extra_conf or {}).get("spark.local.dir"):
        # shuffle/spill on tmpfs: the sandbox VM's ext4 disk is slow and
        # noisy; a real cluster configures fast local SSDs here
        local_dir = f"/dev/shm/spark-local-{os.getpid()}"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # frontiers at scale produce many small state files; keep scans sane
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # defense-in-depth for iterative plans: the plan-description
        # string Spark renders per action grows EXPONENTIALLY with
        # nested InMemoryRelations (an untruncated 20-round loop OOMs
        # the driver inside generateTreeString); loops truncate through
        # SnapshotStore commits, this caps the string if one slips
        .config("spark.sql.maxPlanStringLength", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # keep the pandas-UDF worker pool warm: idle reaping respawns
        # workers every stage at high thread counts (measured 1.6x
        # slowdown at local[32] on UDF-heavy rounds)
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.worker.idleTimeoutSeconds", "0")
        .config("spark.python.factory.idleWorkerMaxPoolSize", str(2 * n_cores))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    return builder.getOrCreate()
