"""Experiment: isolate the Arrow body-transfer scaling layer (BENCH/
BASELINE.md §3, eff 0.55) and test remedies.

Times scan -> validate_image_udf -> noop over a PNG-body parquet at
pinned local[4] vs local[16] under config variants; prints efficiency
per variant. Deterministic (seed 42), fixture in /dev/shm.

Usage:
  python tools/exp_arrow.py                 # all variants
  python tools/exp_arrow.py --run DIR CPUS VARIANT   # one timed child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("EXP_N_IMAGES", "48000"))
POOL = 128
LEVELS = (4, 16)
FIXDIR = "/dev/shm/exp-arrow-fixture"

VARIANTS: dict[str, dict] = {
    # today's bench shape: full-row persist (bodies in columnar cache)
    "baseline_cached": {"cache": True, "conf": {}},
    # bodies stream straight from parquet, never cached
    "nocache": {"cache": False, "conf": {}},
    "nocache_b256": {
        "cache": False,
        "conf": {"spark.sql.execution.arrow.maxRecordsPerBatch": "256"},
    },
    "cached_b256_cb1000": {
        "cache": True,
        "conf": {
            "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
            "spark.sql.inMemoryColumnarStorage.batchSize": "1000",
        },
    },
    "nocache_b256_g1": {
        "cache": False,
        "conf": {
            "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
            "spark.driver.extraJavaOptions": "-XX:+UseG1GC -XX:G1HeapRegionSize=32m",
        },
    },
    # Python-native body read: the JVM plan carries ONLY metadata rows
    # (url, bucket); each mapInPandas task reads its buckets' body
    # parquet directly with pyarrow (mmap from the same files Spark
    # would scan) and runs the decode+phash kernel in-task. Bodies never
    # cross the JVM<->Python Arrow bridge in either direction.
    "pybody": {"cache": False, "conf": {}, "pybody": True},
    # same, plus sinking the full image rows (bytes included) to parquet
    # from the Python task — models the images-table write staying
    # python-side too (no JVM body write either)
    "pybody_sink": {"cache": False, "conf": {}, "pybody": True, "sink": True},
}

N_BUCKETS = 64


def prepare() -> None:
    import numpy as np

    from pholcus_spark import fixtures
    from pholcus_spark.imaging import encode_png, quantize, synth_pixels
    from pholcus_spark.session import build_spark

    if os.path.exists(f"{FIXDIR}/_SUCCESS_MARK"):
        return
    spark = build_spark("exp-prep", parallelism=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)
    pool = [encode_png(quantize(synth_pixels(rng, 256, 256), 16)) for _ in range(POOL)]
    bpool = spark.sparkContext.broadcast(pool)

    def gen(batches):
        import pandas as pd

        blobs = bpool.value
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [f"http://h{i % 64:03d}.test/img/img-{i:08d}.png" for i in ids],
                    "content_type": ["image/png"] * len(ids),
                    "body": [blobs[i % POOL] for i in ids],
                }
            )

    (
        spark.range(N_IMAGES)
        .repartition(64)
        .mapInPandas(gen, "url string, content_type string, body binary")
        .write.mode("overwrite")
        .parquet(f"{FIXDIR}/pages")
    )
    # bucketed body store for the pybody variants: one directory per
    # pmod(xxhash64(url), N_BUCKETS), readable with plain pyarrow
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{FIXDIR}/pages")
        .withColumn("body_bucket", F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)))
        .repartition(N_BUCKETS, "body_bucket")
        .write.mode("overwrite")
        .partitionBy("body_bucket")
        .parquet(f"{FIXDIR}/pages_bucketed")
    )
    open(f"{FIXDIR}/_SUCCESS_MARK", "w").close()
    spark.stop()


def pybody_run(spark, cpus: int, sink: bool) -> None:
    """Meta-only plan + in-task pyarrow body read + in-task kernel
    (+ optional in-task parquet sink of the full image rows) — via the
    production ParquetBodyStore path."""
    import shutil

    from pholcus_spark.bodystore import ParquetBodyStore

    store = ParquetBodyStore(f"{FIXDIR}/pages_bucketed", N_BUCKETS)
    sinkdir = f"/dev/shm/exp-arrow-sink-{cpus}"
    shutil.rmtree(sinkdir, ignore_errors=True)
    meta = spark.read.parquet(store.path).select("url", "content_type")

    def validate_kernel(grp):
        import pandas as pd

        from pholcus_spark.imaging import decode_image, phash64

        phs, oks = [], []
        for b in grp["body"]:
            try:
                px = decode_image(b, "png")
                phs.append(phash64(px))
                oks.append(True)
            except Exception:
                phs.append(None)
                oks.append(False)
        return pd.DataFrame({"url": grp["url"], "phash": phs, "ok": oks})

    if sink:
        os.makedirs(sinkdir, exist_ok=True)

        def sink_kernel(grp):
            import pandas as pd

            out = validate_kernel(grp)
            sink_pdf = pd.DataFrame(
                {
                    "url": grp["url"],
                    "bytes": grp["body"],
                    "phash": out["phash"],
                    "ok": out["ok"],
                }
            )
            return out, sink_pdf

        df = store.sink_map_bodies(
            meta, sink_kernel, "url string, phash long, ok boolean",
            n_tasks=cpus, sink_dir=sinkdir, sink_tag="exp",
        )
    else:
        df = store.map_bodies(
            meta, validate_kernel, "url string, phash long, ok boolean",
            n_tasks=cpus,
        )
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    shutil.rmtree(sinkdir, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "seconds": round(dt, 2),
                      "rows_per_sec": round(N_IMAGES / dt, 1)}))


def timed_run(cpus: int, variant: str) -> None:
    from pholcus_spark.session import build_spark
    from pholcus_spark.validate import validate_image_udf

    spec = VARIANTS[variant]
    spark = build_spark(
        f"exp-{variant}-{cpus}",
        parallelism=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local", **spec["conf"]},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if spec.get("pybody"):
        pybody_run(spark, cpus, sink=bool(spec.get("sink")))
        spark.stop()
        return
    pages = spark.read.parquet(f"{FIXDIR}/pages").repartition(cpus * 4, "url")
    if spec["cache"]:
        pages = pages.persist()
        pages.count()
    else:
        # warm page cache only (fixture already in tmpfs)
        pages.select("url").count()
    df = pages.withColumn(
        "val", validate_image_udf("body", "content_type", "url")
    ).select("url", "val.phash", "val.ok")
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    print(json.dumps({"variant": variant, "cpus": cpus, "seconds": round(dt, 2),
                      "rows_per_sec": round(N_IMAGES / dt, 1)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        timed_run(int(sys.argv[3]), sys.argv[4])
        return
    only = sys.argv[1:] or list(VARIANTS)
    prepare()
    report = {}
    for variant in only:
        rates = {}
        for cpus in LEVELS:
            proc = subprocess.run(
                ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
                 os.path.abspath(__file__), "--run", FIXDIR, str(cpus), variant],
                capture_output=True, text=True, check=True,
            )
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
            rates[cpus] = json.loads(line)
            print(line, file=sys.stderr)
        lo, hi = LEVELS
        eff = (rates[hi]["rows_per_sec"] / rates[lo]["rows_per_sec"]) / (hi / lo)
        report[variant] = {"eff": round(eff, 3), **{str(k): v for k, v in rates.items()}}
        print(f"{variant}: eff={eff:.3f}", file=sys.stderr)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
