"""SparkSession factory tuned for the frontier engine.

Single place where scale-relevant Spark conf lives: AQE on (runtime
re-plan + skew-join mitigation), Arrow on (every UDF in this engine is
pandas/Arrow-vectorized — the input_hint forbids per-row Python), and
shuffle partitions sized to the executor core count rather than the
200 default (at 100 TB you'd size this to cluster cores × 2-3 and rely
on AQE coalescing; locally we match local[N]).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores
    # avoid reverse-DNS stalls in sandboxed/NAT environments (observed
    # ~90 s of the startup without this)
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # Python-worker allocator: keep batch buffers RESIDENT between
    # Arrow batches. This VM's page-fault path serializes under
    # concurrency (see the pretouch note below), and the default
    # allocators give freed big buffers back to the OS — jemalloc/
    # mimalloc decay in pyarrow, mmap in glibc for >128 KB — so every
    # round's fetch+parse re-pays serialized first-touch on all cores
    # at once (re-measured 2026-08-20: first-touch 0.1 GB/s vs reuse
    # 4.7 GB/s single-proc on this host). Route pyarrow through glibc
    # (system pool) and tell glibc to serve big allocations from heap
    # arenas and never trim them; a long-lived reused worker
    # (spark.python.worker.reuse default) then touches its pages once.
    # Harmless on real clusters (RSS parks at the per-worker high-water
    # mark). OPT-IN (SPARK_GRAFT_WORKER_ALLOC=1): measured 2026-08-20
    # at 1M pages/200k batch/4 pinned cores, interleaved best-of-2 —
    # no win (108/120 s off vs 119/119 s on); glibc's dynamic mmap
    # threshold apparently already adapts at this Arrow batch shape.
    # The knob stays for bigger batch shapes and future host eras.
    worker_env = {}
    if os.environ.get("SPARK_GRAFT_WORKER_ALLOC", "0") == "1":
        worker_env = {
            "ARROW_DEFAULT_MEMORY_POOL": "system",
            "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
            "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
        }
        for k, v in worker_env.items():
            # before the JVM gateway launches: workers fork from the
            # (local-mode) JVM and inherit its environment
            os.environ.setdefault(k, v)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        # AQE on by default (runtime re-plan + skew-join mitigation —
        # what you want at 100 TB). SPARK_GRAFT_AQE=0 is an A/B knob
        # for the scaling harness: AQE materializes query stages one
        # by one, and at the engine's bounded per-round plan shapes
        # the per-stage driver re-planning shows up as jobs/round ×
        # scheduling gaps (BENCH/jobgaps); the knob measures that cost
        # without changing any engine dataflow.
        .config("spark.sql.adaptive.enabled",
                "false" if os.environ.get("SPARK_GRAFT_AQE", "1") == "0"
                else "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # local-FS write cost: without libhadoop, every permission op
        # shells out (fork+exec chmod per file — measured ~240 forks
        # per 32-file parquet write). Raw FS drops .crc twins,
        # committer v2 drops the extra rename pass, no _SUCCESS marker.
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    )
    # shuffle/spill scratch: this VM's virtual disk caps at ~350 MB/s
    # aggregate and per-writer throughput collapses ~7× under 16
    # concurrent writers (measured 2026-08-18), which throttles every
    # multi-core shuffle; a real cluster's executor-local NVMe does
    # not behave like this. Default scratch to the RAM-backed tmpfs
    # when present so shuffle I/O models executor-local storage;
    # override with SPARK_GRAFT_LOCAL_DIR.
    scratch = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if scratch is None and os.path.isdir("/dev/shm"):
        scratch = "/dev/shm/spark-local"
    if scratch:
        os.makedirs(scratch, exist_ok=True)
        builder = builder.config("spark.local.dir", scratch)
    # SPARK_GRAFT_PRETOUCH=1: commit the whole driver heap at JVM boot
    # (-Xms=-Xmx + AlwaysPreTouch). This VM's page-fault path
    # SERIALIZES under concurrency (measured 2026-08-19: 1 proc
    # first-touches anon pages at 1.4 GB/s, 16 concurrent procs get
    # 0.31 GB/s AGGREGATE — ~70× per-proc collapse), so on-demand heap
    # growth mid-job stalls every task for tens of seconds exactly
    # when all cores are busy. Pre-touching moves that cost to boot
    # (untimed) and GC then recycles the committed pages. Opt-in:
    # tests and short-lived sessions should not pay the boot cost.
    if os.environ.get("SPARK_GRAFT_PRETOUCH") == "1":
        mem = os.environ.get("SPARK_DRIVER_MEM", "32g")
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch",
        )
    for k, v in worker_env.items():
        # belt-and-suspenders: executorEnv reaches python workers even
        # when the JVM pre-dates this call (shared getOrCreate)
        builder = builder.config(f"spark.executorEnv.{k}", v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    return builder.getOrCreate()
