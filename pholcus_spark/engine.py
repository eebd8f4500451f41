"""The superstep crawl engine — Spark realization of the reference's
crawler loop (`app/crawler/crawler.go:85-174`) as a deterministic
batch-iterative dataflow (SURVEY.md §3.2/§7.0).

Each superstep:

1. **wave select** — politeness-budgeted top-k per host from the queued
   frontier: ``row_number() over (partition by host order by priority
   desc, seq asc) <= budget(host)`` (reference pull order
   `matrix.go:101-124`; budgets are the north-rule crawl-delay
   extension). The *global* rank (wave_pos) is computed only over the
   selected wave (hosts × budget rows), never over the whole frontier —
   the per-host window is the only frontier-wide shuffle and it
   partitions by host.
2. **fetch** — batched fetcher (fixture equi-join / aiohttp mapInPandas).
3. **extract** — Arrow-vectorized link + figure extraction (extract.py),
   image validation (validate.py).
4. **emit** — items and validated image rows appended.
5. **push** — children: absolutize→canonicalize→route→robots-filter→
   SHA-1 key→within-batch dedup (first (wave_pos, ordinal) wins)→
   anti-join vs url_seen ∪ still-queued keys→limit cutoff→dense seq
   assignment (`matrix.go:51-98` Push semantics).
6. **ack** — succeeded keys appended to url_seen (non-reloadable only,
   `matrix.go:144-154`); failures become failed_wait rows; a failure
   whose key already sits in the failure store is recorded permanently
   (`matrix.go:160-168`); when the queue drains, failed_wait rows are
   re-pushed exactly once (`matrix.go:186-202`).
7. **commit** — one catalog snapshot per superstep = the resume point.

Within-wave dedup subtlety (pinned by the oracle): the reference
processes a wave sequentially, deleting each request's temp-history
entry as it goes. A child whose key equals a wave member that *failed*
at position j is therefore accepted only when emitted by a parent at
position i > j (temp already deleted, no success recorded); children
matching *successful* wave members are always dropped (temp before,
success history after). The engine reproduces this with a join against
failed-wave positions.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import SnapshotCatalog
from .keys import (
    canon_host_udf,
    canonicalize_url,
    host_of,
    key_bucket_col,
    request_key,
    request_key_col,
)
from .spiderspec import SpiderSpec, apply_keyin, fanout_spider_name, parse_keyins

FRONTIER_DDL = (
    "key string, spider string, rule string, url string, host string, "
    "method string, post_data string, priority int, seq long, depth int, "
    "parent_url string, tries int, retried boolean, reloadable boolean, "
    "temp map<string,string>, state string"
)
URL_SEEN_DDL = "key string, bucket int"
ORDER_DDL = "spider string, key string, url string, superstep int, wave_pos int, priority int, seq long"


# JVM fast path for canonicalization: a URL matching this is ALREADY in
# canonical form (lowercase http/https scheme + lowercase host, no port,
# no userinfo, non-empty path, no query/fragment/whitespace) — for such
# rows curl == raw and host is a regexp_extract, all inside codegen.
# Everything else (relative leftovers, ports, uppercase, queries, IDN,
# malformed) takes the exact pandas-UDF path. Absolutized crawl links
# overwhelmingly hit the fast path, so the per-link Python cost drops to
# the odd tail — this is the widest stage of a superstep (links ≈ wave ×
# branching).
_FAST_CANON_RE = r"^https?://[a-z0-9\.\-]+/[^?#\s]*$"
_FAST_HOST_RE = r"^https?://([a-z0-9\.\-]+)/"


def paginate_expand(src: DataFrame, pr) -> DataFrame:
    """The PaginateRule count→pages→URL expansion, as a standalone
    DataFrame transform (shared by the engine's ``_paginate_children``
    and the DuckDB correctness gate). Input rows carry ``_data``
    (map<string,string> — the extracted item) and ``parent_url``;
    output explodes one row per page ``start..min(count, max_pages)``
    with ``_page`` (int) and ``raw_link`` columns appended. Non-numeric
    or missing counts expand to zero pages (strconv.Atoi err branch,
    miyabaobei.go:96). All whole-stage codegen: try_cast + sequence +
    format_string — no driver loop, no Python."""
    cnt = F.col("_data").getItem(pr.count_field).try_cast("int")
    last = (
        F.least(cnt, F.lit(pr.max_pages))
        if pr.max_pages is not None
        else cnt
    )
    # guards: sequence(a, b) with b < a steps DOWNWARD in Spark — an
    # exhausted range must be empty, not reversed; and least() SKIPS
    # nulls (least(NULL, max_pages) = max_pages), so the non-numeric-
    # count case must be gated on cnt itself or it would expand to
    # max_pages pages instead of zero (caught by gate q_paginate_expand)
    pages = F.when(
        cnt.isNotNull() & (last >= F.lit(pr.start)),
        F.sequence(F.lit(pr.start), last),
    ).otherwise(F.array().cast("array<int>"))
    out = src.select("*", F.explode(pages).alias("_i"))
    # affine page numbering (page_expr, jdSpider.go:84-97 dual-URL
    # loops): '%d' receives mult*i + add; default (1,0) = i itself
    mult, add = getattr(pr, "page_expr", (1, 0)) or (1, 0)
    out = out.withColumn(
        "_page", (F.col("_i") * F.lit(mult) + F.lit(add)).cast("int")
    ).drop("_i")
    # nullif: an EMPTY base (e.g. a temp_fields merge writing '' for a
    # missing temp) must fall back like a missing one — a bare coalesce
    # passed '' through and format_string built garbage '&page=N' URLs
    # (the oracle twin's `or req.url` already treated '' as missing)
    base = (
        F.coalesce(
            F.nullif(
                F.col("_data").getItem(pr.base_field), F.lit("")
            ),
            F.col("parent_url"),
        )
        if pr.base_field is not None
        else F.col("parent_url")
    )
    raw = (
        F.format_string(pr.url_template, base, F.col("_page"))
        if "%s" in pr.url_template
        else F.format_string(pr.url_template, F.col("_page"))
    )
    return out.withColumn("raw_link", raw)


def canonical_split(df: DataFrame, src_col: str) -> DataFrame:
    """Add ``curl`` (canonical URL) + ``host`` columns: JVM expression
    for already-canonical URLs, vectorized UDF for the rest; rows whose
    URL is malformed canonicalize to NULL curl (caller filters)."""
    fast_cond = F.col(src_col).rlike(_FAST_CANON_RE)
    fast = df.where(fast_cond).withColumns(
        {
            "curl": F.col(src_col),
            "host": F.regexp_extract(F.col(src_col), _FAST_HOST_RE, 1),
        }
    )
    slow = (
        df.where(fast_cond.isNull() | ~fast_cond)
        # repartition BY COLUMN (no fixed count): the slow branch
        # inherits the parent's width (e.g. one partition per body-store
        # bucket) while usually holding a tiny minority of rows — every
        # inherited partition then pays a python-worker round trip for
        # ~0 rows (measured ~140 ms/task at 0 rows). A column shuffle
        # lets AQE size python parallelism by the DATA: near-empty
        # coalesces to one partition, a slow-heavy wave still fans out.
        .repartition(F.col(src_col))
        .withColumn("_ch", canon_host_udf(src_col))
        .withColumns({"curl": F.col("_ch.curl"), "host": F.col("_ch.host")})
        .drop("_ch")
    )
    return fast.unionByName(slow)


def _dlt():
    """DownloadTime provenance (DataCell, `app/pipeline/collector/data/
    data.go:9-13`): wall-clock fetch time as the reference's formatted
    string. Provenance only — never part of a conformance or oracle
    comparison (it is the one intentionally non-deterministic column)."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")


def two_phase_rank(
    df: DataFrame,
    order: list,
    partitions: int,
    out_col: str,
    unpersist_into: list | None = None,
) -> DataFrame:
    """Global ``row_number`` over `order` WITHOUT a single-partition
    exchange.

    Two-phase: range-repartition on the sort key, rank locally inside
    each range partition, then add the cumulative row count of the
    preceding partitions via a broadcast join (the cumulative window
    runs over ≤ `partitions` rows — trivially small). The sort key must
    be unique per row, so the assembled rank is identical to the
    single-window rank regardless of where the range boundaries fall.

    The ranged frame is persist()ed: ``repartitionByRange`` SAMPLES its
    input with a fresh random seed per execution, so the rank subtree
    and the partition-count subtree MUST read one materialization —
    two independent executions can draw different boundaries and
    mis-assemble the global rank (caught by
    tests/test_plans.py::test_two_phase_rank_matches_global_window).
    A lazy cache gives that single execution without the per-call
    driver planning a localCheckpoint forces (~1s/superstep measured);
    the caller owns release via `unpersist_into` (the persisted frame
    is appended for a later ``unpersist()``).
    """
    ranged = (
        df.repartitionByRange(partitions, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if unpersist_into is not None:
        unpersist_into.append(ranged)
    local = Window.partitionBy("_pid").orderBy(*order)
    ranked = ranged.withColumn("_lrank", F.row_number().over(local))
    pc = ranged.groupBy("_pid").agg(F.count("*").alias("_pn"))
    # NOTE: this single-partition window is DELIBERATE and runs over
    # <= `partitions` rows (the per-range counts), never data rows —
    # it is the source of WindowExec's "No Partition Defined" log
    # warnings during a crawl (a foldable partitionBy(lit) key gets
    # optimized away, so the warning cannot be silenced per-window)
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = pc.withColumn(
        "_poff", F.coalesce(F.sum("_pn").over(off_w), F.lit(0))
    ).select("_pid", "_poff")
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_poff") + F.col("_lrank"))
        .drop("_pid", "_lrank", "_poff")
    )


def dense_push_rank(
    df: DataFrame, partitions: int, unpersist_into: list | None = None
) -> DataFrame:
    """Dense global rank over push order (p_prio desc, p_seq asc,
    ordinal asc) via :func:`two_phase_rank` — ordinal disambiguates
    siblings, making the sort key unique per row."""
    order = [F.desc("p_prio"), F.asc("p_seq"), F.asc("ordinal")]
    ranked = two_phase_rank(
        df, order, partitions, "_push_rank", unpersist_into=unpersist_into
    )
    return ranked.withColumn("_push_rank", F.col("_push_rank").cast("int"))


@dataclasses.dataclass
class EngineConfig:
    wave_window_ms: int = 1500
    default_crawl_delay_ms: int = 375  # 1.25 × reference Pausetime 300 ms
    requeue_failures: bool = True
    num_buckets: int = 64  # url_seen bucketing (10^10 scale → 1024+)
    # golden-order table: materializes wave_pos with an UNPARTITIONED
    # window per superstep — a single-partition exchange no production
    # plan should contain. Off by default; conformance fixtures opt in
    # (the order table is a test instrument, not an output).
    record_order: bool = False
    bloom_enabled: bool = True
    bloom_fpp: float = 0.01
    # sidecar rebuild policy (LSM-style): the filters cover url_seen up
    # to their build snapshot; newer keys are exact-anti-joined until the
    # uncovered tail exceeds max(min, frac × covered), then the sidecar
    # is rebuilt at the next flush. Lower bloom_rebuild_min to force the
    # probe path at fixture scale (conformance tests do).
    bloom_rebuild_min: int = 1024
    bloom_rebuild_frac: float = 0.5
    bloom_headroom: float = 2.0
    compact_every: int = 0  # url_seen compaction interval (0 = off)
    # retain at most this many historical snapshots, expiring older
    # manifests + unreferenced data dirs at each flush (0 = keep all).
    # A long crawl REWRITES the frontier per commit, so without expiry
    # storage grows by one full frontier copy per superstep.
    expire_keep_snapshots: int = 0
    # commit (flush) the catalog every N supersteps. 1 = a durable
    # snapshot per superstep (finest resume grain). >1 buffers append
    # deltas in executor caches and flushes them in one commit —
    # resume replays from the last flushed snapshot (deterministic →
    # identical results), trading resume granularity for a large cut in
    # per-superstep Spark-job count. Flushes are forced at stop,
    # failure-requeue, and run() exit.
    commit_every: int = 1
    # fair-share quota: max wave rows per spider, applied to the
    # host-budgeted wave (reference scheduler.go:92-99 avgRes slot cap).
    # None = unlimited (single-spider runs).
    per_spider_quota: int | None = None
    # file sizing: waves are bounded (hosts × budget), so per-superstep
    # append deltas are written with few partitions to keep task-scheduling
    # overhead and small-file count down; scale with expected wave size
    append_partitions: int = 2
    frontier_partitions: int = 8
    # User-Agent assignment for live fetchers (surfer/param.go:85-95):
    # None = no UA column (transport default), "fixed" = pin the first
    # common UA (the reference's cookie-enabled branch), "rotate" =
    # deterministic per-request-key rotation over the common pool.
    ua_mode: str | None = None
    # when the engine was given a proxy-dim BUILDER, re-probe the pool
    # every N supersteps (proxy.go:162-173 UpdateTicker re-sorts the
    # pool each period); 0 = build once at the first wave and keep it
    proxy_refresh_every: int = 0
    # python-side images sink: when the fetcher exposes a body store
    # (StoreFetcher), decode+validate+write image rows inside the python
    # task that reads the bytes — body bytes never cross the JVM<->Python
    # Arrow bridge (the non-scaling layer in BENCH/BASELINE.md §3); the
    # catalog adopts the task-written parquet rows at commit.
    python_image_sink: bool = False
    # adaptive small-wave shuffle width: when the queue holds fewer than
    # ~adaptive_shuffle_rows rows per base shuffle partition, shrink
    # spark.sql.shuffle.partitions for THAT superstep (restored after) —
    # a 1-100-row tail wave otherwise pays 8-32 near-empty tasks per
    # shuffle stage across ~10 stages (measured ~15% of small-wave wall,
    # BENCH/BASELINE.md §7). Results are partition-count independent
    # (pinned by the conformance suite, which runs both shapes). 0
    # disables. NOTE: the conf mutation is session-wide for the duration
    # of one superstep — don't run unrelated SQL concurrently with
    # run() in the same session (the engine assumes it owns the session
    # during a crawl, same as its localCheckpoint/persist discipline).
    adaptive_shuffle_rows: int = 64
    # python body-stage sizing: target rows per body-store python task.
    # The engine caps each superstep's python stages (parse / attach /
    # image sink) at ceil(queue_depth / this) tasks, bounded by the
    # store's bucket count — an empty-ish Arrow task still costs a
    # ~140 ms round trip (BASELINE §6), so a 5-row tail wave should run
    # 1 python task, not bucket-count of them. Bulk waves are unchanged
    # (the cap saturates at the bucket count). 0 disables the cap.
    python_rows_per_task: int = 64


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        catalog: SnapshotCatalog,
        fetcher,
        spec: SpiderSpec,
        robots: DataFrame | None,
        config: EngineConfig | None = None,
        proxy_dim: DataFrame | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.fetcher = fetcher
        self.spec = spec
        self.config = config or EngineConfig()
        # latency-sorted proxy pool dim (proxy.build_proxy_dim) — waves
        # rotate through it per superstep; None = direct fetch. A
        # CALLABLE (superstep -> DataFrame) is the reference's
        # UpdateTicker re-probe cycle (proxy.go:162-173): the engine
        # invokes it at the first wave and again every
        # config.proxy_refresh_every supersteps, so pool membership and
        # latency ranks track the live network while each wave still
        # sees one immutable broadcast dim.
        self._proxy_builder = proxy_dim if callable(proxy_dim) else None
        self.proxy_dim = None if callable(proxy_dim) else proxy_dim
        self._proxy_built_at: int | None = None
        if robots is None:
            robots = spark.createDataFrame(
                [], "host string, disallow_prefixes array<string>, crawl_delay_ms long"
            )
        # allow_prefixes is optional in the dim (legacy all-Disallow
        # shape) — disallow_filter applies RFC 9309 longest-match-wins
        # when it is present
        rcols = ["host", "disallow_prefixes", "crawl_delay_ms"]
        if "allow_prefixes" in robots.columns:
            rcols.insert(2, "allow_prefixes")
        self.robots = robots.select(*rcols)
        self._bloom = None  # BloomSidecar handle (paths/params only)
        self._bloom_load_attempted = False
        self._uncovered_est: int | None = None  # keys not covered by sidecar
        # in-memory frontier carry between supersteps: localCheckpoint
        # truncates lineage each step; parquet stays the durable resume
        # point, but the hot loop never re-reads it
        self._frontier_df = None
        # commit_every>1 buffering: per-table pending append deltas, the
        # caches backing them (unpersisted only after flush), and the
        # in-memory engine state between durable commits
        self._state: dict | None = None
        self._pending: dict[str, list[DataFrame]] = {}
        self._pending_unpersist: list[DataFrame] = []
        # python-sink staging: (manifest_df, rel_dir) pairs per table;
        # manifests are forced (running the sink tasks) then the dirs
        # are adopted by the same catalog commit
        self._pending_adopt: dict[str, list[tuple[DataFrame, str]]] = {}
        self._steps_since_flush = 0
        self._frontier_dirty = False
        # cookie session store (fetcher.enable_cookie): host → {name:
        # value}. The distributed form of the reference's process-wide
        # cookiejar (`downloader_surfer.go:6,21-23`): state lives on the
        # DRIVER (tasks stay stateless/retryable), flows out per wave as
        # a broadcast host→header dim and back in as harvested
        # Set-Cookie rows (only hosts that set cookies — O(changed
        # hosts) per wave). Session-scoped, like the reference: not
        # persisted to the catalog across engine restarts.
        self._cookie_store: dict[str, dict[str, str]] = {}
        # fanout signal for adaptive shuffle sizing: last superstep's
        # children count (round-5 ADVICE — high-fanout small-queue
        # supersteps must not shrink the children shuffles)
        self._last_children_count = 0
        # lazily probed: does the robots dim carry any non-empty
        # disallow list? (guide §2.4: an all-empty dim makes the
        # per-superstep robots join an identity — skip it outright;
        # Allow lists alone cannot block, they only carve out)
        self._robots_active: bool | None = None

    def _proxy_dim_for(self, superstep: int) -> DataFrame | None:
        """Resolve the proxy dim for this wave. Static dim: returned
        as-is. Builder: (re)invoked at the first wave and thereafter
        whenever ``config.proxy_refresh_every`` supersteps have passed
        since the last probe — the engine-paced analog of the
        reference's UpdateTicker re-probe (`proxy.go:162-173`,
        `proxy.go:199-233` testAndSort per period)."""
        if self._proxy_builder is None:
            return self.proxy_dim
        every = self.config.proxy_refresh_every
        stale = (
            self._proxy_built_at is None
            or (every > 0 and superstep - self._proxy_built_at >= every)
        )
        if stale:
            self.proxy_dim = self._proxy_builder(superstep)
            self._proxy_built_at = superstep
        return self.proxy_dim

    # ------------------------------------------------------------------
    # seeding
    # ------------------------------------------------------------------

    def seed(self, seeds: list[dict]) -> None:
        """Push the seed list into the frontier (keyin fan-out per
        `spiderqueue.go:56-90`; robots/dedup/limit apply like any push).

        Fresh catalog: initializes snapshot 0. Non-empty catalog: the new
        seeds are UNIONED into the existing frontier — superstep ids,
        seq counter, totals, and failure-state rows are all preserved
        (the reference inherits success AND failure history on re-run,
        `history.go:83-159`, `matrix.go:40-46`; rewriting state here
        would hand already-failed URLs a fresh retry cycle and collide
        superstep ids in the append-only tables). Seed lists are
        driver-scale by definition — the row build is plain Python; for
        GENERATED seed sets (page ranges, id sweeps — anything you'd
        produce with a loop) use :meth:`seed_range`, which builds the
        rows distributed via ``spark.range`` and never materializes
        them on the driver.
        """
        state0 = self._seed_prelude()
        rows = []
        for s in seeds:
            # method/post_data flow through to the frontier row (and the
            # dedup key, which hashes method) — HtmlForm.submit() dicts
            # seed POST / POST-M requests as-is; both fetchers encode
            # the body from these fields
            method = (s.get("method", "GET") or "GET").upper()
            post_data = s.get("post_data", "") or ""
            # seed Temp carry (baidunews.go:96-103 AddQueue from Root
            # with Temp {"src": k}): rides the frontier row and merges
            # into items via temp_fields like any request temp
            for k in parse_keyins(s.get("keyin", "") or "") or [""]:
                # keyin tokens substitute in temp VALUES too (the
                # reference builds Temps from keyin-derived locals,
                # googlesearch.go:89 / alibaba's paginate base)
                temp = {
                    tk: apply_keyin(str(tv), k)
                    for tk, tv in (s.get("temp") or {}).items()
                }
                spider = fanout_spider_name(s["spider"], k)
                url = canonicalize_url(apply_keyin(s["url"], k))
                host = host_of(url)
                key = request_key(spider, s["rule"], url, method)
                reloadable = url in self.spec.reloadable_urls
                rows.append(
                    (
                        key, spider, s["rule"], url, host, method,
                        post_data,
                        int(s.get("priority", 0)), len(rows), 0, None,
                        0, False, reloadable, temp, "queued",
                    )
                )
        new_df = self.spark.createDataFrame(rows, FRONTIER_DDL)
        # robots disallow via the broadcast dim (shared with seed_range /
        # push path) — never a driver-side collect() of the robots table,
        # which at web scale is a millions-of-hosts dim
        new_df = self._robots_disallow_filter(new_df, "url")
        # in-batch dedup AFTER the robots filter (a blocked row must not
        # shadow an allowed duplicate); first occurrence wins, reloadable
        # rows always pass but still claim their key for later dups
        _kw = Window.partitionBy("key").orderBy(F.asc("seq"))
        new_df = (
            new_df.withColumn("_krn", F.row_number().over(_kw))
            .where(F.col("reloadable") | (F.col("_krn") == 1))
            .drop("_krn")
        )
        self._merge_new_frontier(new_df, state0)

    def _robots_disallow_filter(self, df: DataFrame, url_col: str) -> DataFrame:
        """Drop rows whose URL path matches a robots disallow prefix for
        its host (broadcast-dim equi-join; `df` must carry a `host`
        column). Delegates to :func:`robots.disallow_filter` — the
        oracle-gated standalone form (`q_robots_filter`). A dim with no
        non-empty disallow list anywhere is a proven identity (RFC 9309
        permissive default; Allow-only rules cannot block) — probed
        ONCE per engine, then the per-superstep join is skipped."""
        if self._robots_active is None:
            self._robots_active = bool(
                self.robots.where(
                    F.size(
                        F.coalesce(
                            F.col("disallow_prefixes"),
                            F.array().cast("array<string>"),
                        )
                    )
                    > 0
                ).head(1)
            )
        if not self._robots_active:
            return df
        from . import robots as robots_mod

        return robots_mod.disallow_filter(df, self.robots, url_col)

    def seed_range(
        self,
        url_format: str,
        start: int,
        stop: int,
        rule: str,
        spider: str,
        priority: int = 0,
        temp: dict | None = None,
    ) -> None:
        """Aid-loop page-range seeding (the reference's AidFunc loop,
        `spider.go:57`, e.g. `sample/static_rules/qq_avatar/avatar.go:40-59`:
        Root asks an aid rule to enqueue index_0..index_n URLs from a
        template) as a DISTRIBUTED source: ``spark.range(start, stop)``
        + ``format_string`` generate the URLs executor-side, so a
        10^10-entry range seeds the frontier without ever materializing
        a driver-side list (the reference's for-loop, and our ``seed()``,
        are driver-bound by construction). ``url_format`` is a
        printf-style template receiving the index, e.g.
        ``"http://h.test/page/%d"``. ``temp`` rides every generated
        request (the reference's per-AddQueue ``Temp``/``Header`` in a
        Root loop, weibo_fans.go:57-72 — e.g. a keyin-sourced
        ``{"hdr:Cookie": ...}`` session header).
        """
        gen = (
            self.spark.range(start, stop)
            .select(
                F.format_string(url_format, F.col("id")).alias("raw_url"),
                (F.col("id") - F.lit(start)).alias("_ord"),
            )
        )
        self.seed_urls_df(
            gen, rule=rule, spider=spider, priority=priority, temp=temp
        )

    def seed_urls_df(
        self,
        urls: DataFrame,
        rule: str,
        spider: str,
        priority: int = 0,
        temp: dict | None = None,
    ) -> None:
        """Seed the frontier from ANY DataFrame of URLs — the general
        distributed-seeding form behind :meth:`seed_range` (template
        ranges) and :func:`sitemap.fetch_sitemap_urls` (sitemap
        ingestion). ``urls`` carries ``raw_url`` plus an optional
        ``_ord`` long column fixing FIFO order within the batch
        (missing → one deterministic rank by canonical URL). Robots,
        history dedup, and the in-batch first-wins dedup all apply
        exactly as in every other push path; nothing materializes on
        the driver."""
        state0 = self._seed_prelude()
        reload_list = list(self.spec.reloadable_urls)
        has_ord = "_ord" in urls.columns
        gen = urls.select(
            "raw_url",
            *([F.col("_ord").cast("long").alias("_ord")] if has_ord else []),
        )
        gen = canonical_split(gen, "raw_url").where(F.col("curl").isNotNull())
        if not has_ord:
            # deterministic order for orderless sources: rank by
            # canonical URL, shuffle-parallel (two-phase, no single
            # partition anywhere)
            gen = two_phase_rank(
                gen,
                [F.asc("curl")],
                max(1, self.config.frontier_partitions),
                "_ord",
                unpersist_into=self._pending_unpersist,
            )
        # robots disallow (same broadcast-dim filter as the push path)
        gen = self._robots_disallow_filter(gen, "curl")
        new_df = gen.select(
            request_key_col(
                F.lit(spider), F.lit(rule), F.col("curl"), F.lit("GET")
            ).alias("key"),
            F.lit(spider).alias("spider"),
            F.lit(rule).alias("rule"),
            F.col("curl").alias("url"),
            F.col("host"),
            F.lit("GET").alias("method"),
            F.lit("").alias("post_data"),
            F.lit(priority).alias("priority"),
            F.col("_ord").cast("long").alias("seq"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("string").alias("parent_url"),
            F.lit(0).alias("tries"),
            F.lit(False).alias("retried"),
            (
                F.col("curl").isin(reload_list) if reload_list else F.lit(False)
            ).alias("reloadable"),
            (
                F.create_map(
                    *[
                        F.lit(x)
                        for kv in sorted((temp or {}).items())
                        for x in (str(kv[0]), str(kv[1]))
                    ]
                ).cast("map<string,string>")
                if temp
                else F.create_map().cast("map<string,string>")
            ).alias("temp"),
            F.lit("queued").alias("state"),
        )
        # in-batch dedup (first occurrence wins, like seed()'s seen_keys)
        # — colliding template indices canonicalize to one key
        _kw = Window.partitionBy("key").orderBy(F.asc("seq"))
        new_df = (
            new_df.withColumn("_krn", F.row_number().over(_kw))
            .where(F.col("reloadable") | (F.col("_krn") == 1))
            .drop("_krn")
        )
        self._merge_new_frontier(new_df, state0)

    def _seed_prelude(self):
        state0 = self._state_ref() if self.catalog.state() is not None else None
        if state0 is not None:
            self._flush(state0)  # durable base for the merge
        return state0

    def _merge_new_frontier(self, new_df: DataFrame, state0) -> None:
        # push dedup (hasHistory = success ∪ temp history): inherited
        # url_seen (SuccessInherit) via the Bloom-accelerated
        # _dedup_vs_history — a seed_range re-run against 10^10 seen
        # keys probes the per-bucket sidecars instead of paying a
        # full-table exact anti-join — plus still-queued frontier keys
        # (in-flight, not yet in url_seen: exact anti-join, O(queue))
        old_frontier = None
        if state0 is not None:
            old_frontier = (
                self._frontier_df
                if self._frontier_df is not None
                else self.catalog.read("frontier")
            )
        non_reload = self._dedup_vs_history(new_df.where(~F.col("reloadable")))
        if old_frontier is not None:
            non_reload = non_reload.join(
                old_frontier.where(F.col("state") == "queued").select("key"),
                "key",
                "left_anti",
            )
        new_df = new_df.where(F.col("reloadable")).unionByName(non_reload)
        base_seq = state0["next_seq"] if state0 else 0
        limit = self.spec.limit
        max_page = (
            state0["max_page"]
            if state0
            else (-limit if limit is not None else None)
        )
        # limit guard: accepted (non-dup) seeds consume the remaining
        # budget in seed order (matrix.go:59-61,97 — dups never increment).
        # seq is unique within the batch (seed() ordinal / seed_range _ord),
        # so the two-phase rank avoids funnelling a 10^10-entry seed_range
        # through one task the way a global Window.orderBy would.
        pre = new_df.persist()  # the range rank samples + rescans its input
        _seed_unpersist: list[DataFrame] = []
        new_df = two_phase_rank(
            pre, [F.asc("seq")], max(1, self.config.frontier_partitions), "_rn",
            unpersist_into=_seed_unpersist,
        )
        if max_page is not None:
            new_df = new_df.where(F.col("_rn") <= max(0, -max_page))
        new_df = (
            new_df.withColumn(
                "seq", (F.lit(base_seq) + F.col("_rn") - 1).cast("long")
            )
            .drop("_rn")
            .persist()
        )
        n_new = new_df.count()
        pre.unpersist()
        for _df in _seed_unpersist:
            _df.unpersist()
        if state0 is None:
            state = {
                "superstep": 0,
                "next_seq": n_new,
                "max_page": max_page + n_new if max_page is not None else None,
                "queued_count": n_new,
                "failed_wait_count": 0,
                "stopped": False,
                "totals": {"fetched": 0, "failed": 0, "items": 0, "images": 0},
            }
            self.catalog.commit({}, {"frontier": new_df}, state)
            self._frontier_df = None  # force re-read of the committed frontier
            self._state = state
        else:
            frontier = (
                old_frontier.unionByName(new_df)
                .coalesce(self.config.frontier_partitions)
                .localCheckpoint(eager=True)
            )
            state0.update(
                next_seq=base_seq + n_new,
                max_page=max_page + n_new if max_page is not None else None,
                queued_count=state0["queued_count"] + n_new,
                stopped=state0["stopped"] and n_new == 0,
            )
            self.catalog.commit({}, {"frontier": frontier}, state0)
            if self._frontier_df is not None:
                self._frontier_df.unpersist()
            self._frontier_df = frontier
            self._frontier_dirty = False
        new_df.unpersist()

    # ------------------------------------------------------------------
    # superstep loop
    # ------------------------------------------------------------------

    def _state_ref(self) -> dict:
        if self._state is None:
            self._state = dict(self.catalog.state())
        return self._state

    def run(self, max_supersteps: int | None = None) -> dict[str, Any]:
        while True:
            state = self._state_ref()
            if state["stopped"]:
                break
            if max_supersteps is not None and state["superstep"] >= max_supersteps:
                break
            self.superstep()
        self._flush(self._state_ref())  # durable pause/stop point
        return self.catalog.state()

    def superstep(self) -> int:
        """Run one wave. Returns the wave size (0 = terminated)."""
        state = self._state_ref()
        frontier = (
            self._frontier_df
            if self._frontier_df is not None
            else self.catalog.read("frontier")
        )

        if state["queued_count"] <= 0:
            # requeue and termination decisions read the durable url_seen —
            # flush pending deltas first (<=: a drifted counter — e.g. a
            # fetcher answering one request with several rows — must
            # still terminate, never spin on an empty frontier)
            self._flush(state)
            if state["failed_wait_count"] > 0 and self.config.requeue_failures:
                self._requeue_failures(state, frontier)
                return self.superstep() if not state.get("stopped") else 0
            state["stopped"] = True
            self._flush(state)
            return 0

        cfg = self.config
        t0 = time.time()
        superstep = state["superstep"] + 1
        queued = frontier.where(F.col("state") == "queued")
        others = frontier.where(F.col("state") != "queued")

        # small-wave shuffle shrink (config.adaptive_shuffle_rows): a
        # tail wave of 1-100 rows pays base-width near-empty shuffle
        # tasks across ~10 stages; size this superstep's shuffles by the
        # queue instead, and restore the session default afterwards
        base_sp = None
        if cfg.adaptive_shuffle_rows:
            try:
                base = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            except Exception:
                base = 0
            # size by the LARGER of queue depth and last superstep's
            # children volume: the dominant shuffles (children dedup
            # windows, push rank) scale with wave × out-link fanout,
            # not queue depth — a 100-row wave of pages emitting
            # hundreds of links each must not collapse those stages to
            # 2 partitions (round-5 ADVICE)
            q_rows = max(
                1, state["queued_count"], self._last_children_count
            )
            target = -(-q_rows // cfg.adaptive_shuffle_rows)  # ceil
            if base and target < base:
                base_sp = base
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", str(target)
                )
        try:
            # truncate the wave's lineage: every downstream branch (fetch,
            # fetch_meta, politeness bookkeeping, order table) would
            # otherwise re-analyze the frontier + wave-select window tree on
            # each of its many Dataset creations (driver-side cost, grows
            # with plan size); the wave is materialized exactly once either
            # way, and it is small by construction (Σ host budgets).
            #
            # Default config (no quota, no order table): checkpoint the
            # TAGGED queue (one boolean `_wv` column over ONE window
            # pass) instead of the wave alone — `rest` used to stay a
            # live plan, so the frontier checkpoint and the dedup's
            # in-run-keys branch re-ran the whole wave-select window
            # once more per superstep (guide §2.4: consumers of one
            # partitioning should share one execution). Both frames
            # become cheap filters over one materialization; the quota /
            # record_order shapes keep the original two-frame path
            # (their extra windows run over the wave subset only).
            if (
                self.config.per_spider_quota is None
                and not self.config.record_order
            ):
                tagged = self._wave_tagged(queued).localCheckpoint(
                    eager=True
                )
                wave = tagged.where(F.col("_wv")).drop("_wv")
                rest = tagged.where(~F.col("_wv")).drop("_wv")
            else:
                wave, rest = self._wave_plan(queued)
                wave = wave.localCheckpoint(eager=True)
            if os.environ.get("PHOLCUS_TIMING"):
                print(f"  [t] wave-ckpt {time.time()-t0:.2f}")

            return self._superstep_after_wave(
                state, frontier, others, wave, rest, superstep, t0
            )
        finally:
            if base_sp is not None:
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", str(base_sp)
                )

    def _budget_ranked(self, queued: DataFrame) -> DataFrame:
        """The shared wave-selection core: queued rows joined with the
        broadcast robots delay dim, carrying ``_budget`` (per-host wave
        budget) and ``_host_rank`` (politeness rank within host)."""
        cfg = self.config
        # crawl_delay_ms = 0 falls back to the default exactly like the
        # oracle's `delay or default` (a zero divisor would otherwise
        # NULL out the floor and silently clamp the budget to 1)
        budget = F.greatest(
            F.lit(1),
            F.floor(
                F.lit(cfg.wave_window_ms)
                / F.coalesce(
                    F.nullif(F.col("crawl_delay_ms"), F.lit(0)),
                    F.lit(cfg.default_crawl_delay_ms),
                )
            ),
        ).cast("int")
        by_host = Window.partitionBy("host").orderBy(
            F.desc("priority"), F.asc("seq")
        )
        return queued.join(
            F.broadcast(self.robots.select("host", "crawl_delay_ms")),
            "host",
            "left",
        ).withColumns(
            {"_budget": budget, "_host_rank": F.row_number().over(by_host)}
        )

    def _wave_tagged(self, queued: DataFrame) -> DataFrame:
        """Default-config wave selection as ONE frame: the full queue
        with a boolean ``_wv`` (in-wave) column — a single window pass
        whose checkpoint serves wave AND rest (`_wave_plan`'s two-frame
        form re-executes the window per consumer). Only valid without
        per_spider_quota / record_order (those rank the wave subset)."""
        return self._budget_ranked(queued).withColumn(
            "_wv", F.col("_host_rank") <= F.col("_budget")
        ).drop("crawl_delay_ms", "_budget", "_host_rank")

    def _wave_plan(self, queued: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Wave selection (politeness budgets + fair share) as a pure
        plan: returns (wave, rest) BEFORE lineage truncation so tests
        can assert the plan shape — with the default config this plan
        contains no unpartitioned window (every `row_number` is
        partitioned by host or spider); the single-partition golden-order
        `wave_pos` window exists only behind the test-only
        ``record_order`` opt-in."""
        cfg = self.config
        ranked = self._budget_ranked(queued)
        wave = ranked.where(F.col("_host_rank") <= F.col("_budget")).drop(
            "crawl_delay_ms", "_budget", "_host_rank"
        )
        rest = ranked.where(F.col("_host_rank") > F.col("_budget")).drop(
            "crawl_delay_ms", "_budget", "_host_rank"
        )
        if cfg.per_spider_quota is not None:
            # fair share (scheduler.go:92-99 avgRes): per-spider cap over
            # the host-budgeted wave; overflow returns to the queue. A
            # prefix in (priority desc, seq) order == the oracle's greedy.
            by_spider = Window.partitionBy("spider").orderBy(
                F.desc("priority"), F.asc("seq")
            )
            wave = wave.withColumn("_srank", F.row_number().over(by_spider))
            rest = rest.unionByName(
                wave.where(F.col("_srank") > cfg.per_spider_quota).drop("_srank")
            )
            wave = wave.where(F.col("_srank") <= cfg.per_spider_quota).drop(
                "_srank"
            )
        # NOTE: no global sort of the wave. Within-wave position is the
        # total order (-priority, seq) — used directly for child dedup /
        # seq ordering. A materialized wave_pos (single-partition window)
        # is computed ONLY for the golden-order table in test runs.
        if cfg.record_order:
            wave = wave.withColumn(
                "wave_pos",
                F.row_number().over(
                    Window.orderBy(F.desc("priority"), F.asc("seq"))
                ) - 1,
            )
        return wave, rest

    def _attach_headers(self, wave: DataFrame) -> DataFrame:
        """Author-set request headers out (`request.Request{Header:}`,
        request.go:25): one JVM column merging the spider-static
        ``spec.headers`` with the request's dynamic ``hdr:``-prefixed
        temp entries (fetch.headers_col — dynamic wins). Attached for
        EVERY fetcher: live fetchers send them, the fixture fetcher
        gates ``require_header`` pages on them; the column is dropped
        with the other transport columns right after the fetch."""
        from .fetch import headers_col

        return wave.withColumn("hdr", headers_col(self.spec.headers))

    def _attach_cookies(self, wave: DataFrame) -> DataFrame:
        """Session cookies out: join the wave with the driver-held
        host→Cookie-header dim (broadcast — O(hosts) rows, the robots
        scale class). No-op unless the fetcher opted into cookies."""
        if not getattr(self.fetcher, "enable_cookie", False):
            return wave
        from .httpfetch import cookie_header

        rows = [
            (h, cookie_header(jar))
            for h, jar in self._cookie_store.items()
            if jar
        ]
        if not rows:
            return wave.withColumn("cookie", F.lit(""))
        dim = self.spark.createDataFrame(rows, "host string, cookie string")
        return wave.join(F.broadcast(dim), "host", "left").withColumn(
            "cookie", F.coalesce(F.col("cookie"), F.lit(""))
        )

    def _harvest_cookies(self, fetched: DataFrame) -> None:
        """Session cookies in: fold harvested Set-Cookie headers into
        the store in wave order (priority desc, seq asc — the oracle's
        sequential DoHistory order, so same-name updates are
        deterministic).

        The fold runs DISTRIBUTED per host (applyInPandas group =
        host): each task replays its host's Set-Cookie stream in wave
        order through the same SimpleCookie merge the driver used to
        run row-by-row, and emits only the NET per-host delta — names
        whose last operation was a set, and names whose last operation
        was a delete (the empty-value logout idiom). The driver collect
        is therefore O(hosts-in-wave) rows × O(cookies-per-host) bytes —
        the same scale class as the robots dim — never O(wave rows):
        a cookie-enabled bulk crawl at 10^10-frontier scale streams
        hosts, not responses, to the driver each superstep. The
        driver-resident jar itself stays O(hosts × cookie names); that
        envelope is the login-session use case the reference's cookie
        jar serves (surf's per-client jar), not a per-page cache."""
        if not getattr(self.fetcher, "enable_cookie", False):
            return

        rows = fetched.where(F.size("set_cookies") > 0).select(
            "host", "priority", "seq", "set_cookies"
        )

        def fold(pdf):
            import json

            import pandas as pd

            from pholcus_spark.httpfetch import set_cookie_ops

            pdf = pdf.sort_values(
                ["priority", "seq"], ascending=[False, True]
            )
            # last op per name wins ('' = delete tombstone for the
            # driver's existing jar) — exactly what the sequential
            # merge_set_cookie fold would leave
            net: dict = {}
            for cookies in pdf["set_cookies"]:
                for raw in cookies:
                    for name, value in set_cookie_ops(raw):
                        net[name] = value
            return pd.DataFrame(
                {
                    "host": [pdf["host"].iloc[0]],
                    "sets": [
                        json.dumps(
                            {n: v for n, v in net.items() if v != ""}
                        )
                    ],
                    "dels": [
                        json.dumps(
                            sorted(n for n, v in net.items() if v == "")
                        )
                    ],
                }
            )

        import json

        for r in rows.groupBy("host").applyInPandas(
            fold, "host string, sets string, dels string"
        ).collect():
            jar = self._cookie_store.setdefault(r.host, {})
            for name in json.loads(r.dels):
                jar.pop(name, None)
            jar.update(json.loads(r.sets))

    def _superstep_after_wave(
        self, state, frontier, others, wave, rest, superstep, t0
    ):
        cfg = self.config

        # -- 2. fetch -----------------------------------------------------
        # bodies are NEVER cached: the metadata projection (tiny rows) is
        # what every bookkeeping branch consumes; body-bearing branches
        # (extract, image write) each stream bodies exactly once. With a
        # cheap-meta fetcher the metadata pass never touches bodies at all.
        has_store = getattr(self.fetcher, "store", None) is not None
        # python body-stage width for this superstep: queue depth is a
        # (pre-wave) upper bound on every body batch below — size the
        # mapInPandas stages by DATA, not by inherited bucket width
        # (config.python_rows_per_task; BASELINE §6's lesson)
        py_tasks = None
        if has_store and self.config.python_rows_per_task:
            py_tasks = max(
                1,
                -(-max(1, state["queued_count"])
                  // self.config.python_rows_per_task),
            )
        # author-set request headers ride every fetch (dropped with the
        # other transport columns below)
        wave = self._attach_headers(wave)
        if has_store:
            # body-store fetcher: the JVM plan carries metadata only;
            # each body-consuming branch filters on metadata FIRST and
            # attaches bytes python-side for just its rows (filters do
            # not push through mapInPandas, so attach-then-filter would
            # ship every body)
            fetched_full = None
            # localCheckpoint (not persist): the metadata join is
            # materialized exactly once — it feeds every branch anyway —
            # and TRUNCATES the logical plan, so the ~15 downstream
            # Dataset creations per superstep analyze a one-leaf tree
            # instead of re-walking frontier+wave-select+join each time
            # (driver-side plan-build was ~3s/superstep at fixture scale)
            fetched = (
                self.fetcher.fetch_meta(wave)
                .drop("hdr")
                .localCheckpoint(eager=True)
            )
        elif getattr(self.fetcher, "has_cheap_meta", False):
            # deterministic fetcher: body branches re-derive lazily
            fetched_full = self.fetcher.fetch(wave).drop("hdr")
            fetched = (
                self.fetcher.fetch_meta(wave)
                .drop("hdr")
                .localCheckpoint(eager=True)
            )
        else:
            # live fetcher: fetch exactly once, cache bodies (idempotence)
            wave_out = self._attach_cookies(wave)
            dim = self._proxy_dim_for(superstep)
            if dim is not None:
                from .proxy import assign_proxy

                # tick = superstep: the rotation clock (proxy.go:162-173
                # UpdateTicker advances curIndex per period)
                wave_out = assign_proxy(wave_out, dim, superstep)
            if self.config.ua_mode:
                from .proxy import assign_user_agent

                wave_out = assign_user_agent(wave_out, self.config.ua_mode)
            fetched_cached = self.fetcher.fetch(wave_out).persist()
            # the PERSISTED handle must be the one unpersisted later:
            # uncacheQuery matches on plan identity, so unpersisting the
            # .drop() projection below would strand the cached parent
            # (one wave of raw bodies leaked per superstep)
            self._pending_unpersist.append(fetched_cached)
            self._harvest_cookies(fetched_cached)
            # session/transport columns leave the plan here: downstream
            # stores / unions see the exact pre-attach schema
            fetched_full = fetched_cached.drop(
                "cookie", "set_cookies", "proxy", "ua", "hdr"
            )
            fetched = fetched_full
        if os.environ.get("PHOLCUS_TIMING"):
            print(f"  [t] fetch-ckpt {time.time()-t0:.2f}")
        ok = fetched.where(F.col("ok"))
        failed = fetched.where(~F.col("ok"))
        # same-key repeat failures within one wave (only possible for
        # reloadable rows — non-reloadable keys are unique in the queue):
        # the FIRST failure (wave order) drives the failure store and the
        # within-wave child rule; repeats go straight to the permanent
        # failure history, like the reference's sequential DoHistory
        # hitting an already-stashed key (matrix.go:160-168)
        _wave_fail_rank = Window.partitionBy("key").orderBy(
            F.desc("priority"), F.asc("seq")
        )
        failed_ranked = failed.withColumn(
            "_frank", F.row_number().over(_wave_fail_rank)
        )
        failed_first = failed_ranked.where(F.col("_frank") == 1).drop("_frank")
        failed_repeat = failed_ranked.where(F.col("_frank") > 1).drop("_frank")

        # -- 3/4. extract + emit -------------------------------------------
        from .extract import extract_all_vec
        from .validate import validate_image_udf

        _file_rules = {
            fr.rule: fr.name_or_ext
            for fr in getattr(self.spec, "file_rules", ()) or ()
        }
        _html_filter = F.col("ok") & (F.col("rule") != self.spec.image_rule)
        if _file_rules:
            # FileOutput rules consume the raw body (context.go:252-256
            # io.ReadAll) — never parsed as a page
            _html_filter = _html_filter & ~F.col("rule").isin(
                list(_file_rules)
            )
        if has_store:
            # fused read+parse inside the body-read task — html bodies
            # never enter the JVM plan (metadata filtered FIRST: filters
            # do not push through mapInPandas)
            parsed = self.fetcher.parse_pages(
                fetched.where(_html_filter), self.spec.extract_rules,
                getattr(self.spec, "carry_concat", ()) or (),
                n_tasks=py_tasks,
            ).persist()
        else:
            html_ok = fetched_full.where(_html_filter)
            parsed = (
                html_ok.withColumn(
                    "_ex",
                    extract_all_vec(
                        self.spec.extract_rules,
                        getattr(self.spec, "carry_concat", ()) or (),
                    )("body", "content_type", "url", "rule", "temp"),
                )
                .withColumns(
                    {
                        "out_links": F.col("_ex.out_links"),
                        "figures": F.col("_ex.figures"),
                        "dsl_items": F.col("_ex.dsl_items"),
                        "dsl_links": F.col("_ex.dsl_links"),
                        "dsl_carry": F.col("_ex.dsl_carry"),
                    }
                )
                .drop("_ex", "body")  # bodies leave the plan before the cache
                .persist()
            )

        items = (
            parsed.where(F.col("rule").isin(list(self.spec.item_rules)))
            .select(
                "spider",
                "rule",
                "url",
                F.col("parent_url"),
                F.explode("figures").alias("fig"),
            )
            .select(
                "spider",
                "rule",
                "url",
                "parent_url",
                F.create_map(
                    F.lit("image_id"),
                    F.regexp_extract(F.col("fig.src"), r"/img/(.+)\.(png|jpe?g)$", 1),
                    F.lit("caption"),
                    F.col("fig.caption"),
                ).alias("data"),
            )
            .withColumns({"superstep": F.lit(superstep), "download_time": _dlt()})
        )
        if self.spec.extract_rules:
            # user-authored ExtractRules (the ParseFunc surface),
            # exploded into the same items table as the figure items.
            # Store mode: already computed in the fused parse kernel;
            # otherwise one vectorized body pass.
            # emit=False rules (ParseFunc without ctx.Output —
            # baidunews.go:121-136) drive links/carries/pagination but
            # contribute no output rows. Emit is per ExtractRule: the
            # fused kernel tags non-emitting rules' items with
            # NOEMIT_KEY, filtered (and stripped) here — so emitting
            # and non-emitting ExtractRules may share one rule name
            # (baidusearch: result items Output, the page-level
            # next-link probe doesn't). Rule names where NOTHING emits
            # skip the union entirely.
            dsl_rules = sorted(
                {
                    er.rule
                    for er in self.spec.extract_rules
                    if getattr(er, "emit", True)
                }
            )
            # both modes: the fused parse already computed dsl_items in
            # the same body pass as links/figures
            # temp_fields merged task-side inside the fused parse (the
            # UDF/kernel receives the request temp), so items here are
            # already carry-complete — including multi-hop re-carry
            from .extract import NOEMIT_KEY, OUTRULE_KEY

            dsl_src = (
                parsed.where(F.col("rule").isin(dsl_rules))
                .select(
                    "spider", "rule", "url", "parent_url",
                    F.explode("dsl_items").alias("data"),
                )
                .where(
                    ~F.map_contains_key(F.col("data"), F.lit(NOEMIT_KEY))
                )
                # ctx.Parse relabel (ExtractRule.out_rule → SetRuleName,
                # context.go:363): the item's rule column is the
                # delegated name; the marker never reaches the table
                .withColumn(
                    "rule",
                    F.coalesce(
                        F.try_element_at(
                            F.col("data"), F.lit(OUTRULE_KEY)
                        ),
                        F.col("rule"),
                    ),
                )
                .withColumn(
                    "data",
                    F.map_filter(
                        F.col("data"),
                        lambda k, _v: k != F.lit(OUTRULE_KEY),
                    ),
                )
            )  # download_time/superstep added with the figure items below
            items = items.unionByName(
                dsl_src.withColumns(
                    {"superstep": F.lit(superstep), "download_time": _dlt()}
                )
            )

        use_pysink = self.config.python_image_sink and has_store
        _img_filter = F.col("ok") & (F.col("rule") == self.spec.image_rule)
        if use_pysink:
            image_ok = fetched.where(_img_filter)  # metadata only
        elif has_store:
            image_ok = self.fetcher.attach_bodies(
                fetched.where(_img_filter), n_tasks=py_tasks
            )
        else:
            image_ok = fetched_full.where(_img_filter)
        images = None if use_pysink else (
            image_ok.withColumn(
                "val", validate_image_udf("body", "content_type", "url")
            )
            .select(
                F.coalesce(
                    F.try_element_at(F.col("temp"), F.lit("image_id")),
                    F.regexp_extract("url", r"/img/(.+)\.(png|jpe?g)$", 1),
                ).alias("image_id"),
                F.col("body").alias("bytes"),
                F.col("val.w").alias("w"),
                F.col("val.h").alias("h"),
                F.when(F.col("content_type").contains("jpeg"), "jpeg")
                .otherwise("png")
                .alias("fmt"),
                F.coalesce(
                    F.try_element_at(F.col("temp"), F.lit("caption")), F.lit("")
                ).alias("caption"),
                F.col("val.phash").alias("phash"),
                F.col("val.ok").alias("valid"),
                F.col("val.error").alias("error"),
                F.col("url"),
                F.col("parent_url"),
            )
            .withColumns({"superstep": F.lit(superstep), "download_time": _dlt()})
        )
        files = None
        if _file_rules:
            # FileCells (context.go:247-284): raw body + derived name.
            # Name derivation is pure JVM (file_output_name_col); the
            # per-rule nameOrExt constants fold into a when-chain.
            from .sinks import file_output_name_col

            _file_filter = F.col("ok") & F.col("rule").isin(list(_file_rules))
            if has_store:
                file_ok = self.fetcher.attach_bodies(
                    fetched.where(_file_filter), n_tasks=py_tasks
                )
            else:
                file_ok = fetched_full.where(_file_filter)
            name_col = F.lit(None).cast("string")
            for r, arg in _file_rules.items():
                name_col = F.when(
                    F.col("rule") == r, file_output_name_col(F.col("url"), arg)
                ).otherwise(name_col)
            files = (
                file_ok.select(
                    "spider",
                    "rule",
                    "url",
                    "parent_url",
                    name_col.alias("name"),
                    F.col("body").alias("bytes"),
                    F.length("body").cast("long").alias("size"),
                )
                .withColumns(
                    {"superstep": F.lit(superstep), "download_time": _dlt()}
                )
            )
        items = items.persist()
        # images is intentionally NOT persisted and NOT counted via its own
        # branch: its row count equals the ok image-rule rows (metadata),
        # so the decode UDF + body stream execute exactly once — inside
        # the flush write

        # -- 5. children push ----------------------------------------------
        # checkpoint: the emission chain (explode -> canonicalize UDF ->
        # route -> robots -> key) is re-analyzed by every dedup/rank/
        # failure Dataset below; truncating it once keeps those trees
        # flat. Wave-proportional rows, materialized once either way.
        if os.environ.get("PHOLCUS_TIMING_DETAIL"):
            # measurement aid only: force the parse cache so the
            # children checkpoint below attributes parse vs emit time
            parsed.count()
            print(f"  [t] parse-forced {time.time()-t0:.2f}")
        children = self._emit_children(parsed, superstep).localCheckpoint(
            eager=True
        )
        if os.environ.get("PHOLCUS_TIMING"):
            print(f"  [t] children-ckpt {time.time()-t0:.2f}")
        # dedup (matrix.go:81-86 hasHistory = success-history ∪ temp-history):
        #   in-run keys (this wave's successes + still-queued) are small and
        #   checked with a plain anti-join; the historical url_seen — the
        #   10^10-scale side — goes through the Bloom sidecar so the exact
        #   anti-join only sees probable hits + the uncovered recent tail.
        new_seen = ok.where(~F.col("reloadable")).select("key")
        # no distinct: the right side of a left_anti join needs no
        # dedup (identical result, one aggregate+exchange less per
        # superstep — guide §2.4 "a distinct on data that is already
        # unique"-class removal; here duplicates are simply harmless)
        in_run_keys = new_seen.union(rest.select("key"))
        non_reload = children.where(~F.col("reloadable")).join(
            in_run_keys, "key", "left_anti"
        )
        non_reload = self._dedup_vs_history(non_reload)
        # reloadable children skip every dedup check (request.go:270-277)
        kept = non_reload.unionByName(children.where(F.col("reloadable")))
        # failed-wave-position rule (see module docstring); reloadable
        # exempt. Wave position i > j  <=>  (-prio_i, seq_i) > (-prio_j,
        # seq_j) lexicographically — no materialized position needed.
        failed_pos = failed_first.select(
            F.col("key").alias("_fkey"),
            F.col("priority").alias("_fprio"),
            F.col("seq").alias("_fseq"),
        )
        kept = (
            kept.join(failed_pos, kept["key"] == failed_pos["_fkey"], "left")
            .where(
                F.col("reloadable")
                | F.col("_fkey").isNull()
                | (F.col("p_prio") < F.col("_fprio"))
                | (
                    (F.col("p_prio") == F.col("_fprio"))
                    & (F.col("p_seq") > F.col("_fseq"))
                )
            )
            .drop("_fkey", "_fprio", "_fseq")
        )
        # within-batch dedup: first emitter in wave order wins (non-reloadable)
        by_key = Window.partitionBy("key").orderBy(
            F.desc("p_prio"), F.asc("p_seq"), F.asc("ordinal")
        )
        kept = kept.withColumn("_rn", F.row_number().over(by_key)).where(
            F.col("reloadable") | (F.col("_rn") == 1)
        ).drop("_rn")
        # limit guard cutoff in push order (matrix.go:59-61,97) and dense
        # seq assignment both need a global rank over the CHILDREN — the
        # two-phase form keeps it shuffle-parallel (no single-partition
        # exchange anywhere in the superstep plan)
        kept_base = kept.persist()
        kept = dense_push_rank(
            kept_base,
            max(1, self.config.frontier_partitions),
            unpersist_into=self._pending_unpersist,
        )
        if state["max_page"] is not None:
            allowed = max(0, -state["max_page"])
            kept = kept.where(F.col("_push_rank") <= allowed)
        kept = kept.persist()
        new_rows = kept.select(
            "key", "spider", "rule",
            F.col("curl").alias("url"), "host",
            "method", "post_data", "priority",
            (F.lit(state["next_seq"]) + F.col("_push_rank") - 1).alias("seq"),
            "depth", "parent_url",
            F.lit(0).alias("tries"), F.lit(False).alias("retried"),
            "reloadable", "temp",
            F.lit("queued").alias("state"),
        )

        # -- 6. ack / failure state machine --------------------------------
        fail_store_keys = others.where(
            F.col("state").isin("failed_wait", "failed_nil")
        ).select(F.col("key").alias("_sk"))
        failed2 = failed_first.join(
            fail_store_keys, failed_first["key"] == fail_store_keys["_sk"], "left"
        )
        perm_failed = failed2.where(F.col("_sk").isNotNull()).select(
            "key", "spider", "rule", "url",
            F.lit(superstep).alias("superstep"),
        ).unionByName(
            failed_repeat.select(
                "key", "spider", "rule", "url",
                F.lit(superstep).alias("superstep"),
            )
        )
        new_failed_wait = failed2.where(F.col("_sk").isNull()).select(
            "key", "spider", "rule", "url", "host", "method", "post_data",
            "priority", "seq", "depth", "parent_url",
            (F.col("tries") + 1).alias("tries"), "retried", "reloadable",
            "temp",
            F.lit("failed_wait").alias("state"),
        )

        # -- counts: ONE job over the persisted branches ---------------------
        import os as _os
        _dbg = _os.environ.get("PHOLCUS_TIMING")
        if _dbg:
            print(f"  [t] plan-build {time.time()-t0:.2f}")
        # -- 7a. next frontier FIRST (round-5 superstep fixed-cost cut):
        # the frontier checkpoint forces the expensive spine (children
        # dedup + rank via new_rows) exactly once; the counts job below
        # then reads persisted/materialized branches and costs one
        # near-free pass instead of re-materializing the spine itself.
        # new_rows only needs state["next_seq"] (pre-update), never the
        # counts, so the reorder is purely a scheduling change.
        new_frontier = (
            rest.select(*[c for c in rest.columns])
            .unionByName(others)
            .unionByName(new_rows)
            .unionByName(new_failed_wait)
        )
        _tf = time.time()
        new_frontier = new_frontier.coalesce(
            self.config.frontier_partitions
        ).localCheckpoint(eager=True)
        if _dbg:
            print(f"  [t] frontier-ckpt {time.time()-_tf:.2f}")
        _tc = time.time()
        # wave/ok/images/files are all conditional counts over ONE scan
        # of the checkpointed fetch metadata — a single aggregate
        # replaces four separate tagged scans of the same rows (the
        # remaining branches read different caches and stay tagged)
        _ok1 = F.col("ok").cast("long")
        fetched_aggs = [
            F.count("*").alias("wave"),
            F.sum(_ok1).alias("ok"),
            F.sum(
                (F.col("ok") & (F.col("rule") == self.spec.image_rule))
                .cast("long")
            ).alias("images"),
        ]
        if _file_rules:
            fetched_aggs.append(
                F.sum(
                    (F.col("ok") & F.col("rule").isin(list(_file_rules)))
                    .cast("long")
                ).alias("files")
            )
        fetched_counts = fetched.agg(*fetched_aggs).select(
            F.explode(
                F.create_map(
                    *[
                        c
                        for name in (
                            ["wave", "ok", "images"]
                            + (["files"] if _file_rules else [])
                        )
                        for c in (F.lit(name), F.coalesce(F.col(name), F.lit(0)))
                    ]
                )
            ).alias("t", "n")
        )
        tag = lambda df, t: df.select(F.lit(t).alias("t"))  # noqa: E731
        counts_src = (
            tag(items, "items")
            .union(tag(perm_failed, "perm"))
            .union(tag(kept, "children"))
            .groupBy("t")
            .agg(F.count("*").alias("n"))
            .unionByName(fetched_counts)
        )
        counts = dict((r.t, r.n) for r in counts_src.collect())
        if _dbg:
            print(f"  [t] count-job {time.time()-_tc:.2f}")
        wave_size = counts.get("wave", 0)
        n_ok = counts.get("ok", 0)
        n_failed = wave_size - n_ok
        n_perm_failed = counts.get("perm", 0)
        n_items = counts.get("items", 0)
        n_images = counts.get("images", 0)
        n_files = counts.get("files", 0)
        n_children = counts.get("children", 0)
        self._last_children_count = n_children

        # -- lineage: per-host (the crawl's natural partition) --------------
        lineage = (
            fetched.groupBy("host")
            .agg(
                F.count("*").alias("fetched"),
                F.sum(F.col("ok").cast("int")).alias("succeeded"),
            )
            .withColumn("superstep", F.lit(superstep))
        )
        metrics = self.spark.createDataFrame(
            [
                (
                    superstep, wave_size, n_ok, n_failed, n_perm_failed,
                    n_items, n_images, n_children,
                    float(time.time() - t0),
                )
            ],
            "superstep int, wave_size long, fetched long, failed long, "
            "failed_final long, items long, images long, children long, "
            "seconds double",
        )

        # -- 7. commit (frontier already checkpointed above) -----------------
        # skip writes we know are empty — each append is a Spark job
        appends = {"metrics": metrics}
        if wave_size > 0:
            appends["lineage"] = lineage
        if n_ok > 0:
            appends["url_seen"] = new_seen.withColumn(
                "bucket", key_bucket_col(F.col("key"), self.config.num_buckets)
            )
        if n_items > 0:
            appends["items"] = items
        if n_files > 0:
            appends["files"] = files
        if n_images > 0 and not use_pysink:
            appends["images"] = images
        elif n_images > 0:
            from .validate import images_arrow_schema, make_image_sink_kernel

            # stage OUTSIDE the table dir (.staging is invisible to the
            # streaming consumer's {table}/* glob and to Spark scans),
            # and clear any leftover from a crashed prior run — a
            # resumed run with a different config must not adopt stale
            # orphan part files (round-2 ADVICE); the flush publishes
            # the dir into images/ with one rename
            stage_rel = f"images/stage-{superstep:06d}"
            stage_dir = os.path.join(
                self.catalog.root, ".staging", f"images-stage-{superstep:06d}"
            )
            shutil.rmtree(stage_dir, ignore_errors=True)
            os.makedirs(stage_dir)
            manifest = self.fetcher.store.sink_map_bodies(
                image_ok.select(
                    "url", "parent_url", "content_type", "temp"
                ),
                make_image_sink_kernel(
                    superstep,
                    session_tz=self.spark.conf.get(
                        "spark.sql.session.timeZone", "UTC"
                    ),
                ),
                "image_id string, valid boolean",
                n_tasks=py_tasks,
                sink_dir=stage_dir,
                sink_tag=f"s{superstep:06d}",
                sink_arrow_schema=images_arrow_schema(),
            )
            self._pending_adopt.setdefault("images", []).append(
                (manifest, stage_dir, stage_rel)
            )
        if n_perm_failed > 0:
            appends["failures_final"] = perm_failed
        if self.config.record_order and wave_size > 0:
            appends["order"] = wave.select(
                "spider", "key", "url",
                F.lit(superstep).alias("superstep"),
                F.col("wave_pos").cast("int"),
                "priority", "seq",
            )
        state.update(
            superstep=superstep,
            next_seq=state["next_seq"] + n_children,
            max_page=(
                state["max_page"] + n_children
                if state["max_page"] is not None
                else None
            ),
            # an EMPTY wave despite queued_count > 0 is counter drift
            # (selection takes a non-empty prefix whenever any queued
            # row exists — budget >= 1 per host): trust the frontier,
            # not the counter, or the loop would spin forever
            queued_count=(
                n_children
                if wave_size == 0
                else state["queued_count"] - wave_size + n_children
            ),
            failed_wait_count=state["failed_wait_count"]
            + (n_failed - n_perm_failed),
        )
        state["totals"]["fetched"] += n_ok
        state["totals"]["failed"] += n_failed
        state["totals"]["items"] += n_items
        state["totals"]["images"] += n_images
        if _file_rules:
            # resume-safe: older checkpoints predate the files counter
            state["totals"]["files"] = (
                state["totals"].get("files", 0) + n_files
            )
        ap = self.config.append_partitions
        appends = {k: v.coalesce(ap) for k, v in appends.items()}
        if self._frontier_df is not None:
            # old checkpoint may still back pending append plans — defer
            self._pending_unpersist.append(self._frontier_df)
        self._frontier_df = new_frontier
        self._frontier_dirty = True
        for name, df in appends.items():
            self._pending.setdefault(name, []).append(df)
        self._pending_unpersist.extend([fetched, parsed, kept_base, kept, items])
        if n_ok > 0:
            # appended keys sit in the uncovered tail until the sidecar
            # is rebuilt (exact-joined meanwhile — _dedup_vs_history)
            self._uncovered_est = (self._uncovered_est or 0) + n_ok
        self._steps_since_flush += 1
        if self._steps_since_flush >= self.config.commit_every:
            _tfl = time.time()
            self._flush(state)
            if _dbg:
                print(f"  [t] flush {time.time()-_tfl:.2f}")
        return wave_size

    def _flush(self, state: dict) -> None:
        """Durably commit buffered append deltas + the current frontier +
        state as one catalog snapshot, then release the caches that
        backed the buffered plans."""
        appends: dict[str, DataFrame] = {}
        for name, dfs in self._pending.items():
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            appends[name] = out
        rewrites = (
            {"frontier": self._frontier_df}
            if (self._frontier_dirty and self._frontier_df is not None)
            else {}
        )
        adopt: dict[str, list[str]] = {}
        staged_all = [
            (name, manifest, stage_dir, rel)
            for name, staged in self._pending_adopt.items()
            for manifest, stage_dir, rel in staged
        ]

        def _force_adopt(item):
            # forcing the manifest runs the python sink tasks; the
            # files land in the invisible .staging dir, which one
            # rename publishes under the table dir before the commit
            # adopts it (a crash before here leaves only .staging
            # orphans — never visible to readers or streams)
            _name, manifest, stage_dir, rel = item
            manifest.write.mode("overwrite").format("noop").save()
            dst = os.path.join(self.catalog.root, rel)
            shutil.rmtree(dst, ignore_errors=True)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(stage_dir, dst)

        _dbg = os.environ.get("PHOLCUS_TIMING")
        _tm = time.time()
        if len(staged_all) > 1:
            # commit_every>1 buffers one independent staged sink per
            # superstep; run them as concurrent Spark jobs so the tail
            # tasks of one back-fill cores freed by another (guide
            # §2.6) — a few in flight is enough, and it bounds python
            # worker pressure
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(3, len(staged_all))
            ) as pool:
                list(pool.map(_force_adopt, staged_all))
        else:
            for item in staged_all:
                _force_adopt(item)
        for name, _m, _s, rel in staged_all:
            adopt.setdefault(name, []).append(rel)
        self._pending_adopt = {}
        if _dbg and staged_all:
            print(f"  [t] flush-sinks {time.time()-_tm:.2f}")
        _tc = time.time()
        self.catalog.commit(appends, rewrites, state, adopt=adopt)
        if _dbg:
            print(f"  [t] flush-commit {time.time()-_tc:.2f}")
        for df in self._pending_unpersist:
            df.unpersist()
        self._pending = {}
        self._pending_unpersist = []
        self._steps_since_flush = 0
        self._frontier_dirty = False
        if self.config.compact_every:
            m = self.catalog.current()
            dirs = (m["tables"].get("url_seen") or {}).get("dirs", [])
            if len(dirs) >= self.config.compact_every:
                self.catalog.compact("url_seen")
                # coverage now points at rewritten dirs — invalidate
                self._bloom = None
                self._uncovered_est = None
        if self.config.expire_keep_snapshots:
            self.catalog.expire_snapshots(
                keep_last=self.config.expire_keep_snapshots
            )
        self._maybe_rebuild_bloom()

    # ------------------------------------------------------------------

    def _emit_children(self, parsed: DataFrame, superstep: int) -> DataFrame:
        """Explode out-links into routed, keyed child requests."""
        spec = self.spec
        # children come from anchors AND embedded image srcs — the reference
        # enqueues file downloads from img srcs via ctx.AddQueue just like
        # page links (context.go:104-125, FileOutput path :247-284).
        #
        # Round-5 shape: the figure-caption carry and the rule-authored
        # Temp carry ride the SAME explode as the links, as struct
        # entries, instead of the previous separate figs/carries
        # branches (each its own canonical_split python stage + dedup
        # window + join back). One canonicalize pass and one last-wins
        # window over (parent_url, curl) replace two python round trips,
        # two windows and two joins per superstep — and for an
        # image-heavy crawl (figures ≈ children, the north-rule shape)
        # the join form's build side was the same size as the probe, so
        # this is also strictly fewer shuffles at bulk scale.
        follow = getattr(spec, "follow_anchors", True)
        has_carry = any(
            getattr(er, "carry_fields", ()) or ()
            for er in spec.extract_rules
        )
        null_fig = F.lit(None).cast(
            "struct<caption:string,image_id:string>"
        )
        null_map = F.lit(None).cast("map<string,string>")

        def _entry(raw, fig=None, ctemp=None, emit=True):
            return F.struct(
                raw.alias("raw_link"),
                (fig if fig is not None else null_fig).alias("fig0"),
                (ctemp if ctemp is not None else null_map).alias("ctemp0"),
                F.lit(emit).alias("is_emit"),
            )

        emit_arrays = []
        if follow:
            emit_arrays.append(
                F.transform(F.col("out_links"), lambda l: _entry(l))
            )
        # figure entries are always present: emitted children when
        # follow_anchors, caption-carry-only otherwise (explicit-
        # AddQueue ports still attach figure Temp to matching children)
        emit_arrays.append(
            F.transform(
                F.col("figures"),
                lambda f: _entry(
                    f["src"],
                    fig=F.struct(
                        f["caption"].alias("caption"),
                        F.regexp_extract(
                            f["src"], r"/img/(.+)\.(png|jpe?g)$", 1
                        ).alias("image_id"),
                    ),
                    emit=follow,
                ),
            )
        )
        # link_fields-emitted children (ctx.AddQueue from rule data,
        # avatar.go:95-101) — last in push order; the authored carry
        # (dsl_carry, parallel array) rides the same entry
        emit_arrays.append(
            F.transform(
                F.coalesce(
                    F.col("dsl_links"), F.array().cast("array<string>")
                ),
                lambda l, i: _entry(
                    l,
                    ctemp=(
                        F.try_element_at(F.col("dsl_carry"), i + 1)
                        if has_carry
                        else None
                    ),
                ),
            )
        )
        links = parsed.select(
            "spider",
            F.col("url").alias("parent_url"),
            "depth",
            F.col("priority").alias("p_prio"),
            F.col("seq").alias("p_seq"),
            F.posexplode(F.concat(*emit_arrays)).alias("ordinal", "_e"),
        ).select(
            "spider", "parent_url", "depth", "p_prio", "p_seq", "ordinal",
            F.col("_e.raw_link").alias("raw_link"),
            F.col("_e.fig0").alias("fig0"),
            F.col("_e.ctemp0").alias("ctemp0"),
            F.col("_e.is_emit").alias("is_emit"),
        )
        if spec.max_depth is not None:
            links = links.where(F.col("depth") < spec.max_depth)
        # malformed hrefs canonicalize to NULL and are dropped, never
        # fatal (common.go:178-196 MakeUrl ok=false; oracle does the same)
        links = canonical_split(links, "raw_link").where(
            F.col("curl").isNotNull()
        )
        # route: first matching pattern wins (spiderspec order) — a chained
        # CASE WHEN stays JVM-side in whole-stage codegen. The LinkRule also
        # fixes the HTTP method + POST body (param.go:61-84).
        rule_col = F.lit(None).cast("string")
        prio_col = F.lit(None).cast("int")
        method_col = F.lit(None).cast("string")
        post_col = F.lit(None).cast("string")
        for lr in reversed(spec.link_rules):
            cond = F.col("curl").contains(lr.pattern)
            rule_col = F.when(cond, F.lit(lr.rule)).otherwise(rule_col)
            prio_col = F.when(cond, F.lit(lr.priority)).otherwise(prio_col)
            method_col = F.when(cond, F.lit(lr.method)).otherwise(method_col)
            post_col = F.when(cond, F.lit(lr.post_data)).otherwise(post_col)
        # carry-only entries (is_emit=false — the follow_anchors=False
        # figure shape) survive routing and are filtered after the
        # attach window below. In follow mode, unrouted figure entries
        # drop HERE — and that is correct, not a donation leak (round-5
        # ADVICE, adjudicated round 6 against the conformance oracle):
        # routing is a pure function of curl, so a same-curl anchors/
        # link_fields child is unrouted exactly when the figure is, and
        # the only routing-bypassing children (paginate rows) take
        # their Temp from PaginateRule.carry_fields in the oracle,
        # never from figures — keeping unrouted figures as donors here
        # would make the engine diverge from it.
        links = links.withColumns(
            {
                "rule": rule_col,
                "priority": prio_col,
                "method": method_col,
                "post_data": post_col,
            }
        ).where(F.col("rule").isNotNull() | ~F.col("is_emit"))
        # extract-count pagination (PaginateRule — the reference's
        # Aid-loop idiom): expanded JVM-side, pushed after the page's
        # other children via the ordinal block offset; joins the same
        # robots / temp-carry / key pipeline below
        if getattr(spec, "paginate_rules", ()) or ():
            pag = self._paginate_children(parsed)
            if pag is not None:
                # allowMissingColumns: pag rows add `pcarry` (the
                # PaginateRule Temp carry); link rows get it as null
                links = links.unionByName(pag, allowMissingColumns=True)
        # robots filter (north-rule extension): the shared oracle-gated
        # broadcast-dim primitive (RFC 9309 longest-match incl. Allow)
        links = self._robots_disallow_filter(links, "curl")
        # attach the carried Temp: the LAST (by emission ordinal)
        # figure caption / authored carry among same-(parent, curl)
        # entries wins — matching the oracle's dict assignment; the
        # whole fig struct transfers at once so a last figure with a
        # null caption still overrides an earlier one wholesale.
        # Paginate rows (unioned without entry columns) participate as
        # attach TARGETS only (is_emit null → kept by the coalesce).
        attach = (
            Window.partitionBy("parent_url", "curl")
            .orderBy("ordinal")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        links = (
            links.withColumns(
                {
                    "_fig": F.last("fig0", ignorenulls=True).over(attach),
                    "_ctemp": (
                        F.last("ctemp0", ignorenulls=True).over(attach)
                        if has_carry
                        else null_map
                    ),
                }
            )
            .where(F.coalesce(F.col("is_emit"), F.lit(True)))
            .drop("fig0", "ctemp0", "is_emit")
        )
        # generic Temp carry-along (request.go:280-332, temp.go:11-44):
        # a map<string,string> column on the frontier row; the figure
        # carry (caption/image_id for image children) populates it here,
        # a rule-authored carry (_ctemp) REPLACES it when present
        reload_list = list(spec.reloadable_urls)
        # method is part of the identity key: the same URL under GET and
        # POST is two frontier entries (request.go:139-145)
        temp_sources = [F.col("_ctemp")]
        if "pcarry" in links.columns:  # PaginateRule carry (taobao.go:244)
            temp_sources.append(F.col("pcarry"))
        links = links.withColumns(
            {
                "temp": F.coalesce(
                    *temp_sources,
                    F.map_filter(
                        F.create_map(
                            F.lit("caption"), F.col("_fig.caption"),
                            F.lit("image_id"), F.col("_fig.image_id"),
                        ),
                        lambda k, v: v.isNotNull(),
                    ),
                ),
                "reloadable": (
                    F.col("curl").isin(reload_list)
                    if reload_list
                    else F.lit(False)
                ),
                "key": request_key_col(
                    F.col("spider"), F.col("rule"), F.col("curl"), F.col("method")
                ),
                "depth": F.col("depth") + 1,
            }
        ).drop("_fig", "_ctemp", "pcarry")
        return links

    def _paginate_children(self, parsed: DataFrame) -> DataFrame | None:
        """PaginateRule expansion — the reference's extract-count-then-
        Aid-loop pagination (miyabaobei.go:86-105 ``ctx.Aid({"loop":
        [1, total]})``; same shape in taobao.go / jdSpider.go /
        lewa.go), fully distributed: the count rides the page's
        extracted items (dsl_items), ``sequence`` + ``format_string``
        expand pages ``start..min(count, max_pages)`` inside whole-stage
        codegen — no driver loop, no Python stage, no extra body pass.

        Generated children carry ``target_rule``/``priority``/
        ``method`` directly (ctx.Aid names the rule — LinkRule routing
        is bypassed) and an ordinal in a dedicated block per item
        (``(ipos+1)·2^20 + page``) so push order is: anchors, figure
        srcs, link_fields children, then pagination — FIFO-stable and
        mirrored independently by the conformance oracle. Returns rows
        shaped exactly like the routed-links frame at the union point
        (post canonical_split + routing, pre robots)."""
        spec = self.spec
        parts: list[DataFrame] = []
        for pr in getattr(spec, "paginate_rules", ()) or ():
            src = parsed.where(F.col("rule") == pr.rule).select(
                "spider",
                F.col("url").alias("parent_url"),
                "depth",
                F.col("priority").alias("p_prio"),
                F.col("seq").alias("p_seq"),
                F.posexplode("dsl_items").alias("ipos", "_data"),
            )
            if spec.max_depth is not None:
                src = src.where(F.col("depth") < spec.max_depth)
            # the reference's next-page AddQueue carries the grown Temp
            # (taobao.go:244-250): {dst: item[src]} from the emitting
            # item rides every generated page request
            cfs = getattr(pr, "carry_fields", ()) or ()
            if cfs:
                kv: list = []
                for c in cfs:
                    src_f, dst_f = (c, c) if isinstance(c, str) else c
                    kv += [
                        F.lit(dst_f),
                        F.coalesce(
                            F.try_element_at(F.col("_data"), F.lit(src_f)),
                            F.lit(""),
                        ),
                    ]
                pcarry = F.create_map(*kv)
            else:
                pcarry = F.lit(None).cast("map<string,string>")
            part = paginate_expand(src, pr).select(
                "spider", "parent_url", "depth", "p_prio", "p_seq",
                ((F.col("ipos") + 1) * F.lit(1 << 20) + F.col("_page"))
                .alias("ordinal"),
                F.col("raw_link"),
                pcarry.alias("pcarry"),
            )
            part = canonical_split(part, "raw_link").where(
                F.col("curl").isNotNull()
            )
            parts.append(
                part.withColumns(
                    {
                        "rule": F.lit(pr.target_rule),
                        "priority": F.lit(pr.priority).cast("int"),
                        "method": F.lit(pr.method),
                        "post_data": F.lit(""),
                    }
                )
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _seen_dirs(self) -> list[str]:
        m = self.catalog.current()
        if m is None:
            return []
        return list((m["tables"].get("url_seen") or {}).get("dirs", []))

    def _read_seen(
        self, dirs: list[str], pending: list[DataFrame]
    ) -> DataFrame | None:
        df = self.catalog.read_dirs("url_seen", dirs)
        for p in pending:
            df = p if df is None else df.unionByName(p)
        return df

    def _valid_sidecar(self, dirs: list[str]):
        """Current sidecar handle iff its coverage is still a subset of
        the live url_seen dirs (compaction invalidates it)."""
        if not self._bloom_load_attempted and self._bloom is None:
            from . import bloom

            self._bloom = bloom.load_sidecar(
                os.path.join(self.catalog.root, "bloom")
            )
            self._bloom_load_attempted = True
        sidecar = self._bloom
        if sidecar is not None and not set(sidecar.covered_dirs) <= set(dirs):
            self._bloom = sidecar = None
            self._uncovered_est = None
        return sidecar

    def _dedup_vs_history(self, candidates: DataFrame) -> DataFrame:
        """Anti-join candidates vs the historical url_seen, Bloom-
        accelerated and fully distributed.

        Covered portion (filters built at the last rebuild): cogrouped
        per-bucket probe — definitely-unseen rows pass with NO exact
        join; probable hits (candidates × FPR + true dups) exact-join
        only the covered dirs. Uncovered tail (keys appended since the
        rebuild, incl. unflushed deltas): small and recent, exact
        anti-join. At 10^10 keys this keeps per-superstep dedup O(wave),
        with no driver-resident or broadcast bitmap state (SURVEY.md
        §7.3).
        """
        from . import bloom

        dirs = self._seen_dirs()
        pending = self._pending.get("url_seen", [])
        sidecar = (
            self._valid_sidecar(dirs) if self.config.bloom_enabled else None
        )
        if sidecar is None:
            return bloom.filter_unseen(
                candidates, None, None, self._read_seen(dirs, pending)
            )
        covered = list(sidecar.covered_dirs)
        uncovered = [d for d in dirs if d not in sidecar.covered_dirs]
        return bloom.filter_unseen(
            candidates,
            sidecar,
            self.catalog.read_dirs("url_seen", covered),
            self._read_seen(uncovered, pending),
        )

    def _maybe_rebuild_bloom(self) -> None:
        """At flush time: fold the uncovered url_seen tail into a fresh
        sidecar when it has outgrown the rebuild threshold. The build is
        one applyInPandas job over the full (durable) url_seen; filters
        land as a parquet table — never on the driver."""
        cfg = self.config
        if not cfg.bloom_enabled:
            return
        dirs = self._seen_dirs()
        if not dirs:
            return
        sidecar = self._valid_sidecar(dirs)
        covered_n = sidecar.n_keys if sidecar is not None else 0
        if self._uncovered_est is None:
            uncovered = [
                d
                for d in dirs
                if sidecar is None or d not in sidecar.covered_dirs
            ]
            df = self.catalog.read_dirs("url_seen", uncovered)
            self._uncovered_est = df.count() if df is not None else 0
        threshold = max(cfg.bloom_rebuild_min, cfg.bloom_rebuild_frac * covered_n)
        if self._uncovered_est <= threshold:
            return
        from . import bloom

        m = self.catalog.current()
        out = os.path.join(
            self.catalog.root, "bloom", f"v{m['snapshot_id']:06d}"
        )
        self._bloom = bloom.build_sidecar(
            self.catalog.read("url_seen"),
            cfg.num_buckets,
            out,
            fpp=cfg.bloom_fpp,
            covered_dirs=tuple(dirs),
            headroom=cfg.bloom_headroom,
        )
        self._uncovered_est = 0

    def _requeue_failures(self, state: dict, frontier: DataFrame) -> None:
        """failure-requeue-once at queue drain (`matrix.go:186-202`)."""
        fw = frontier.where(F.col("state") == "failed_wait")
        rest = frontier.where(F.col("state") != "failed_wait")
        # failed keys are normally absent from url_seen, but a reloadable
        # success followed by a same-key failure can collide: dedup via
        # the Bloom-accelerated probe (same path as the per-wave push),
        # not a full url_seen anti-join
        cand = fw.where(F.col("reloadable")).unionByName(
            self._dedup_vs_history(fw.where(~F.col("reloadable")))
        )
        # one requeue per key (the failure store is key-addressed,
        # matrix.go:160-168): keep the earliest failure if duplicates slip in
        per_key = Window.partitionBy("key").orderBy(F.asc("seq"))
        cand_pre = (
            cand.withColumn("_krn", F.row_number().over(per_key))
            .where(F.col("_krn") == 1)
            .drop("_krn")
            .persist()  # two_phase_rank samples + rescans its input
        )
        # seq is unique after the per-key dedup, so the distributed rank
        # is deterministic (failures can be O(frontier) on a bad day —
        # never a single-partition window here)
        _rq_unpersist: list[DataFrame] = []
        cand = two_phase_rank(
            cand_pre, [F.asc("seq")], max(1, self.config.frontier_partitions),
            "_rank", unpersist_into=_rq_unpersist,
        )
        if state["max_page"] is not None:
            cand = cand.where(F.col("_rank") <= max(0, -state["max_page"]))
        requeued = cand.select(
            "key", "spider", "rule", "url", "host", "method", "post_data",
            "priority",
            (F.lit(state["next_seq"]) + F.col("_rank") - 1).alias("seq"),
            "depth", "parent_url", "tries",
            F.lit(True).alias("retried"), "reloadable", "temp",
            F.lit("queued").alias("state"),
        ).persist()
        n = requeued.count()
        nils = fw.withColumn("state", F.lit("failed_nil"))
        new_frontier = (
            rest.unionByName(nils)
            .unionByName(requeued)
            .coalesce(self.config.frontier_partitions)
            .localCheckpoint(eager=True)
        )
        state.update(
            next_seq=state["next_seq"] + n,
            max_page=(state["max_page"] + n if state["max_page"] is not None else None),
            queued_count=n,
            failed_wait_count=0,
        )
        if n == 0:
            state["stopped"] = True
        self.catalog.commit({}, {"frontier": new_frontier}, state)
        if self._frontier_df is not None:
            self._frontier_df.unpersist()
        self._frontier_df = new_frontier
        self._frontier_dirty = False
        requeued.unpersist()
        cand_pre.unpersist()
        for _df in _rq_unpersist:
            _df.unpersist()
