"""SparkSession factory tuned for the inverted-file workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "invertedfiles_jl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Defaults are sized for the sandbox (``local[N]``) but every setting is
    the one you would ship to a 1000-executor cluster: AQE on (runtime
    coalescing + skew-join splitting), Arrow on (vectorized pandas UDF
    transfer), and shuffle partitions matched to parallelism.
    """
    # Python workers must import this package regardless of driver cwd —
    # local-mode analog of `spark-submit --py-files` (the north rule's
    # cluster deploy mode).  Must happen before the JVM launches.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(":"):
        os.environ["PYTHONPATH"] = f"{repo_root}:{pp}" if pp else repo_root

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]").replace("*", str(os.cpu_count() or 8)))
        except (IndexError, ValueError):
            n = 32
        shuffle_partitions = max(8, n)

    # Benchmark-stability JVM options (opt-in: SPARK_GRAFT_JVM_STABLE=1).
    # Lazy heap growth dominates first-run stage timings in local mode: the
    # JVM commits tens of GB of pages mid-job (measured: the SAME tf stage
    # 93.8s on first run vs 20.5s re-run; with -Xms=-Xmx + AlwaysPreTouch it
    # is 30.5s vs 20.5s).  Pre-committing the heap moves that one-time cost
    # to session startup, outside any timed region — the local-mode analog
    # of a long-running executor's steady-state heap.  ParallelGC beats G1
    # for this pure-batch workload.  Must be set before the JVM launches,
    # hence PYSPARK_SUBMIT_ARGS and not builder.config.
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "48g")
    if (os.environ.get("SPARK_GRAFT_JVM_STABLE")
            and "PYSPARK_SUBMIT_ARGS" not in os.environ):
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f'--driver-java-options "-Xms{driver_mem} -XX:+AlwaysPreTouch '
            f'-XX:+UseParallelGC" pyspark-shell'
        )

    # Shuffle/spill scratch: prefer tmpfs.  local[N] shares ONE disk across
    # all "executors"; a real cluster scales disk bandwidth with nodes, so
    # disk-bound shuffle writes would understate scaling in this sandbox.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE coalescing writes compact tables as few large files; with the
        # default 128 MB split size a later scan of a ~300 MB postings table
        # starts at 2-3 partitions and the whole map side serializes.  32 MB
        # splits keep small/mid tables parallel; at real scale AQE still
        # coalesces tiny tasks away, so the only cost is scheduler overhead.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # Scan-split FLOOR tied to parallelism: a 100 MB intermediate table
        # (e.g. the persisted tf stage) otherwise opens as ⌈100/32⌉ ≈ 4
        # splits and caps every downstream map side at 4 tasks no matter how
        # many executors exist — the build's scaling was split-capped, not
        # shuffle-capped (measured: postings-stage map side ran 4 tasks at
        # local[16]).  The floor follows cluster size exactly like a real
        # deployment's `defaultParallelism`-based split planning.
        .config("spark.sql.files.minPartitionNum", str(2 * shuffle_partitions))
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Shuffle/broadcast block codec knob (A/B measured 2026-08-17:
        # zstd made the tokenize stage ~25% SLOWER at local[16] — raw
        # source text costs more to zstd-compress than the saved bytes
        # return on a tmpfs shuffle path — so the Spark default lz4 stays).
        .config("spark.io.compression.codec",
                os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"))
    )
    if master.startswith("local") and (local_dir or "").startswith("/dev/shm"):
        # local-mode shuffle through a tmpfs local dir hits RAM, not a NIC
        # or a disk — lz4 on that path is pure CPU for zero saved I/O.
        # A/B (08-21, pinned weak cells): compress off is ~7% faster at
        # both local[4]/20k and local[16]/80k.  Gated on the dir actually
        # being tmpfs: a disk-backed local dir (no /dev/shm, or
        # SPARK_LOCAL_DIRS pointing at real storage) keeps compression —
        # uncompressed shuffle files there are several times larger and
        # disk-bound.  Cluster masters always keep the Spark defaults:
        # network shuffle bytes are worth compressing.
        builder = (builder
                   .config("spark.shuffle.compress", "false")
                   .config("spark.shuffle.spill.compress", "false"))
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
