"""commit_every > 1 must be result-identical to per-superstep commits —
only the snapshot cadence changes."""

from pholcus_spark import fixtures, testkit
from pholcus_spark.engine import EngineConfig
from pholcus_spark.spiderspec import SpiderSpec


def outputs(run):
    seen = {r.key for r in run.df("url_seen").select("key").collect()}
    order = testkit.order_tuples_engine(run)
    items = testkit.items_set_engine(run)
    images = {(r.image_id, r.caption) for r in run.df("images").collect()}
    ff = run.df("failures_final")
    failed = sorted(r.key for r in ff.collect()) if ff is not None else []
    return seen, order, items, images, failed


def test_buffered_commits_equivalent(spark):
    corpus = fixtures.generate(
        fixtures.SiteSpec(n_hosts=2, list_pages=7, flaky_rate=0.1, fail_404_rate=0.1)
    )
    spec = SpiderSpec("site")
    a = testkit.run_engine(
        spark, corpus, spec, EngineConfig(wave_window_ms=3000, commit_every=1)
    )
    b = testkit.run_engine(
        spark, corpus, spec, EngineConfig(wave_window_ms=3000, commit_every=4)
    )
    try:
        assert outputs(a) == outputs(b)
        # buffered run produced fewer snapshots
        assert len(b.catalog.snapshots()) < len(a.catalog.snapshots())
    finally:
        a.cleanup()
        b.cleanup()


def test_buffered_resume_from_flushed_snapshot(spark):
    import shutil
    import tempfile

    corpus = fixtures.generate(
        fixtures.SiteSpec(n_hosts=2, list_pages=7, flaky_rate=0.1)
    )
    spec = SpiderSpec("site")
    cfg = EngineConfig(wave_window_ms=3000, commit_every=3)
    full = testkit.run_engine(spark, corpus, spec, cfg)
    try:
        expected = outputs(full)
    finally:
        full.cleanup()
    workdir = tempfile.mkdtemp(prefix="pholcus-ce-resume-")
    try:
        part = testkit.run_engine(
            spark, corpus, spec, cfg, workdir=workdir, max_supersteps=4
        )
        assert not part.state["stopped"]
        resumed = testkit.run_engine(spark, corpus, spec, cfg, workdir=workdir)
        assert resumed.state["stopped"]
        assert outputs(resumed) == expected
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
