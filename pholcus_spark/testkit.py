"""Shared helpers for conformance tests and the bench harness: run the
Spark engine and the pure-Python oracle over the same fixture corpus and
shape both results for comparison."""

from __future__ import annotations

import dataclasses
import shutil
import tempfile

from pyspark.sql import SparkSession

from . import fixtures, oracle
from .catalog import SnapshotCatalog
from .engine import CrawlEngine, EngineConfig
from .fetch import FixtureFetcher
from .spiderspec import SpiderSpec


@dataclasses.dataclass
class EngineRun:
    catalog: SnapshotCatalog
    state: dict
    workdir: str

    def df(self, name):
        return self.catalog.read(name)

    def cleanup(self):
        shutil.rmtree(self.workdir, ignore_errors=True)
        shutil.rmtree(f"{self.workdir}-bodystore", ignore_errors=True)


def run_engine(
    spark: SparkSession,
    corpus: fixtures.Corpus,
    spec: SpiderSpec,
    config: EngineConfig | None = None,
    workdir: str | None = None,
    max_supersteps: int | None = None,
    engine_out: list | None = None,
    try_times: int = 1,
    body_store: bool = False,
) -> EngineRun:
    workdir = workdir or tempfile.mkdtemp(prefix="pholcus-engine-")
    pages, images, truth, seeds_df, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    if body_store:
        from .bodystore import ParquetBodyStore
        from .fetch import StoreFetcher

        store = ParquetBodyStore.write(
            pages, f"{workdir}-bodystore", n_buckets=16
        )
        fetcher = StoreFetcher(spark, store, try_times=try_times)
    else:
        fetcher = FixtureFetcher(pages.persist(), try_times=try_times)
    engine = CrawlEngine(
        spark, catalog, fetcher, spec, robots, config or EngineConfig(),
    )
    if engine_out is not None:
        engine_out.append(engine)
    if catalog.current() is None:
        engine.seed(corpus.seeds)
    state = engine.run(max_supersteps=max_supersteps)
    return EngineRun(catalog=catalog, state=state, workdir=workdir)


def run_oracle(
    corpus: fixtures.Corpus,
    spec: SpiderSpec,
    config: oracle.OracleConfig | None = None,
) -> oracle.OracleResult:
    return oracle.crawl(
        corpus.pages_by_url(),
        {i["image_id"]: i for i in corpus.images},
        corpus.seeds,
        corpus.robots,
        spec,
        config or oracle.OracleConfig(),
    )


def order_tuples_engine(run: EngineRun) -> list[tuple]:
    df = run.df("order")
    if df is None:
        return []
    rows = df.collect()
    return sorted((r.superstep, r.wave_pos, r.spider, r.key) for r in rows)


def order_tuples_oracle(res: oracle.OracleResult) -> list[tuple]:
    return sorted(
        (o["superstep"], o["wave_pos"], o["spider"], o["key"]) for o in res.order
    )


def items_set_engine(run: EngineRun) -> set[tuple]:
    df = run.df("items")
    if df is None:
        return set()
    return {
        (r.rule, r.url, r.parent_url, tuple(sorted(r.data.items())))
        for r in df.collect()
    }


def items_set_oracle(res: oracle.OracleResult) -> set[tuple]:
    return {
        (i["rule"], i["url"], i["parent_url"], tuple(sorted(i["data"].items())))
        for i in res.items
    }
