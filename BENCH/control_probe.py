"""Platform control: generic pure-JVM Spark job at 1 vs 4 pinned cores.
Same work both legs; measures the box's own Spark scaling ceiling."""
import json, subprocess, sys, os

CODE = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from crawler_spark.session import get_spark
from pyspark.sql import functions as F
cores = int(sys.argv[1])
spark = get_spark(f"ctrl_{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet("/dev/shm/scaling_corpus_2000000_0")
def cpu():
    f = open("/proc/stat").readline().split()
    v = [int(x) for x in f[1:9]]
    return v[0]+v[1]+v[2]+v[5]+v[6]
# warm: one pass
df.select(F.count("*")).collect()
c0 = cpu(); t = time.time()
for _ in range(3):
    # engine-like mix: scan, regex extract, explode, md5, groupBy
    out = (df.select(F.explode(F.regexp_extract_all("text", F.lit(r'<a href="([^"]+)" class="link">'), F.lit(1))).alias("u"))
             .select(F.md5(F.concat(F.lit("x"), F.col("u"))).alias("h"))
             .groupBy(F.substring("h", 1, 2)).count())
    out.agg(F.sum("count")).collect()
dt = time.time() - t; dc = (cpu() - c0) / 100
print("CTRL " + json.dumps({"cores": cores, "secs": round(dt,2), "busy_core_s": round(dc,1)}))
spark.stop()
"""
res = {}
for cores in (4, 1, 4, 1):
    pin = ["taskset", "-c", "8-11" if cores == 4 else "8"]
    env = dict(os.environ, SPARK_DRIVER_MEM="24g", SPARK_GRAFT_PRETOUCH="1")
    out = subprocess.run(pin + [sys.executable, "-c", CODE, str(cores)],
                         capture_output=True, text=True, timeout=1200, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("CTRL "):
            r = json.loads(line[5:])
            res.setdefault(cores, []).append(r)
            print(r, flush=True)
b1 = min(r["secs"] for r in res[1]); b4 = min(r["secs"] for r in res[4])
print(f"control speedup 1->4: {b1/b4:.2f}x  eff {b1/b4/4:.3f}")
c1 = min(r["busy_core_s"] for r in res[1]); c4 = min(r["busy_core_s"] for r in res[4])
print(f"busy-core-seconds 1c={c1} 4c={c4} amplification {c4/c1:.2f}x")
