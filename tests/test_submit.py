"""Deployment-contract test: the package runs under
`spark-submit --py-files pholcus_spark.zip job.py` — the exact
invocation the north rule prescribes for a multi-executor cluster
(BASELINE.json: "run via spark-submit --py-files"). The job imports
pholcus_spark ONLY from the shipped zip (cwd is elsewhere), drives a
tiny fixture crawl end-to-end, and reports catalog counts."""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys
from pholcus_spark.session import build_spark
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.spiderspec import SpiderSpec
from pholcus_spark import fixtures

workdir = sys.argv[1]
spark = build_spark("submit-job", parallelism=4, shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
corpus = fixtures.generate(
    fixtures.SiteSpec(n_hosts=1, list_pages=2, flaky_rate=0.0, fail_404_rate=0.0)
)
pages, _i, _t, _s, robots = fixtures.to_spark(spark, corpus)
cat = SnapshotCatalog(workdir, spark)
eng = CrawlEngine(
    spark, cat, FixtureFetcher(pages), SpiderSpec("site"), robots,
    EngineConfig(wave_window_ms=6000),
)
eng.seed(corpus.seeds)
state = eng.run()
seen = cat.read("url_seen").count()
items = cat.read("items").count()
print(f"SUBMIT_OK stopped={state['stopped']} url_seen={seen} items={items}")
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    zip_path = shutil.make_archive(
        str(tmp_path / "pholcus_spark"), "zip",
        root_dir=REPO, base_dir="pholcus_spark",
    )
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {
        k: v for k, v in os.environ.items()
        # the job must resolve pholcus_spark from --py-files, not from
        # an inherited path to the repo
        if k not in ("PYTHONPATH",)
    }
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zip_path,
            str(job), str(tmp_path / "wd"),
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("SUBMIT_OK")]
    assert line, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "stopped=True" in line[0]
    # tiny fixture: exact golden counts for n_hosts=1, list_pages=2
    parts = dict(p.split("=") for p in line[0].split()[1:])
    assert int(parts["url_seen"]) > 0 and int(parts["items"]) > 0
