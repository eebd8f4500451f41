"""Batched fetch stage — the Spark replacement for the reference's
downloader (`app/downloader/downloader_surfer.go:35-74`, Surf HTTP
`app/downloader/surfer/surf.go:52-197`).

Two interchangeable implementations behind one interface (SURVEY.md
§7.3: the fetch stage must be cleanly swappable because tests run with
no network):

* :class:`FixtureFetcher` — deterministic equi-join against the fixture
  ``pages`` table. Flaky pages (fail first, succeed on retry) model the
  transient-error path that drives the reference's
  failure-requeue-once (`matrix.go:144-204`); missing URLs and
  status>=400 model the permanent path (`downloader_surfer.go:67-69`).
* :class:`HttpFetcher` — an ``aiohttp``-based ``mapInPandas`` batch
  fetcher for production clusters. Gated behind an import-try; this
  container has no aiohttp and tests never touch the network.

Both return the wave DataFrame extended with
``status int, content_type string, body binary, ok boolean``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


HDR_TEMP_PREFIX = "hdr:"


def headers_col(spec_headers: tuple = ()) -> "F.Column":
    """Merged per-request extra-header column (JSON string, '' = none),
    entirely JVM-side: static ``SpiderSpec.headers`` pairs overlaid by
    the request's dynamic ``temp`` entries whose keys start with
    ``hdr:`` (key stripped of the prefix; dynamic wins on collision —
    the reference sets request.Header per AddQueue, so the
    per-request value is the author's latest word). Empty merge → ''
    so fetchers can treat the column as optional."""
    dyn = F.transform_keys(
        F.map_filter(
            F.coalesce(
                F.col("temp"), F.create_map().cast("map<string,string>")
            ),
            lambda k, _v: k.startswith(HDR_TEMP_PREFIX),
        ),
        lambda k, _v: F.substring(k, len(HDR_TEMP_PREFIX) + 1, 2048),
    )
    if spec_headers:
        kv: list = []
        for name, value in spec_headers:
            kv += [F.lit(name), F.lit(value)]
        static = F.create_map(*kv)
        merged = F.map_concat(
            F.map_filter(
                static, lambda k, _v: ~F.map_contains_key(dyn, k)
            ),
            dyn,
        )
    else:
        merged = dyn
    return F.when(F.size(merged) > 0, F.to_json(merged)).otherwise(F.lit(""))


class FixtureFetcher:
    """Fetch = left equi-join on canonical URL against the pages fixture.

    The join is the 'scan of the web' (SURVEY.md §2.1). The pages side
    is pre-repartitioned on url so repeated waves reuse a stable
    shuffle; at bench scale AQE handles the skewed hot host.
    """

    # a fixture fetch is a deterministic table lookup, so the engine may
    # ask for the cheap metadata-only projection separately from bodies
    # (body bytes then flow ONLY through the extract/validate branches).
    # A live HTTP fetcher can't fetch twice — it sets this False and the
    # engine falls back to a single full fetch.
    has_cheap_meta = True

    def __init__(self, pages: DataFrame, try_times: int = 1):
        # try_times models the reference's in-fetch bounded retry
        # (TryTimes, `surf.go:158-197`): one engine-level fetch of a row
        # with `tries` prior fetches has consumed (tries+1)*try_times
        # cumulative attempts; a page declaring `fail_attempts` failing
        # attempts succeeds once the cumulative count exceeds it. The
        # legacy `flaky` boolean is fail_attempts=1.
        self.try_times = try_times
        cols = [
            c
            for c in ("status", "flaky", "content_type", "body",
                      "require_header")
            if c in pages.columns  # StoreFetcher meta carries no body
        ]
        if "fail_attempts" in pages.columns:
            cols.append("fail_attempts")
        # keep only fetch-relevant columns; canonical url join key.
        # _page_post: POST-body-keyed page (zhihu_bianji.go:85-90
        # idiom) — a page row with non-empty post_data answers only the
        # request whose body equals it. Do NOT mix '' and non-'' rows
        # for one url — '' matches any request to the url.
        extra = (
            [F.coalesce(F.col("post_data"), F.lit("")).alias("_page_post")]
            if "post_data" in pages.columns
            else []
        )
        self.pages = pages.select(
            F.col("url").alias("_page_url"), *cols, *extra
        )
        if "fail_attempts" not in pages.columns:
            self.pages = self.pages.withColumn(
                "fail_attempts", F.lit(None).cast("int")
            )
        # fixture contract: one page row per (url, post body). A
        # duplicate would DOUBLE every wave row through the left join —
        # downstream counters drift and the run never terminates. Fail
        # loudly at construction instead (test-only fetcher: the eager
        # count is fine here).
        dup = (
            self.pages.groupBy(
                "_page_url",
                *(
                    ["_page_post"]
                    if "_page_post" in self.pages.columns
                    else []
                ),
            )
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"FixtureFetcher: duplicate page row for url "
                f"{dup[0]['_page_url']!r} — one row per (url, post_data)"
            )

    def _join(self, wave: DataFrame, pages: DataFrame) -> DataFrame:
        cond = wave["url"] == pages["_page_url"]
        if "_page_post" in pages.columns:
            cond = cond & (
                (pages["_page_post"] == "")
                | (
                    pages["_page_post"]
                    == F.coalesce(wave["post_data"], F.lit(""))
                )
            )
        joined = wave.join(pages, cond, "left").drop(
            "_page_url", "_page_post"
        )
        if "require_header" in joined.columns:
            # header-walled page: 403 unless the request's hdr JSON
            # (engine-attached, fetch.headers_col) carries the named
            # header with the exact value — all JVM (from_json +
            # element_at). A wave with no hdr column sent nothing.
            sent = (
                F.from_json(F.col("hdr"), "map<string,string>")
                if "hdr" in joined.columns
                else F.create_map().cast("map<string,string>")
            )
            want = F.split(F.col("require_header"), ": ", 2)
            met = F.coalesce(
                F.try_element_at(sent, want.getItem(0))
                == want.getItem(1),
                F.lit(False),
            )
            joined = joined.withColumn(
                "status",
                F.when(
                    F.col("require_header").isNotNull() & ~met, F.lit(403)
                ).otherwise(F.col("status")),
            ).drop("require_header")
        fail_n = F.coalesce(
            F.col("fail_attempts"),
            F.when(F.coalesce(F.col("flaky"), F.lit(False)), 1).otherwise(0),
        )
        return (
            joined.withColumn("status", F.coalesce(F.col("status"), F.lit(599)))
            .withColumn(
                "ok",
                (F.col("status") < 400)
                & ((F.col("tries") + 1) * self.try_times > fail_n),
            )
            .drop("flaky", "fail_attempts")
        )

    def fetch(self, wave: DataFrame) -> DataFrame:
        return self._join(wave, self.pages)

    def fetch_meta(self, wave: DataFrame) -> DataFrame:
        """Metadata-only fetch result (no body column) — the columnar
        page cache prunes the body column, so this join moves KBs, not
        the corpus."""
        return self._join(wave, self.pages.drop("body"))


class StoreFetcher(FixtureFetcher):
    """FixtureFetcher over a :class:`~pholcus_spark.bodystore.ParquetBodyStore`:
    the JVM plan joins waves against the store's metadata projection only
    (body column pruned at the parquet scan); body-consuming stages pull
    bytes python-side via ``store.map_bodies`` so bodies never cross the
    JVM<->Python Arrow bridge (BENCH/BASELINE.md §3 — the 0.55-efficiency
    serialization layer is removed from the plan entirely).
    """

    def __init__(self, spark, store, try_times: int = 1):
        from pyspark.sql import functions as F  # noqa: F811

        self.store = store
        meta = spark.read.parquet(store.path).drop("body", "body_bucket")
        super().__init__(meta, try_times=try_times)

    def attach_bodies(
        self, meta: DataFrame, n_tasks: int | None = None
    ) -> DataFrame:
        """Attach body bytes to an (already filtered!) metadata frame —
        a python-side bucket read + yield, costing one Python->JVM body
        crossing for exactly these rows. Callers MUST filter first:
        filters cannot be pushed through mapInPandas, so attaching
        before filtering would ship every body. ``n_tasks`` caps the
        python stage width for small batches (bodystore._bucketed)."""
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in meta.schema.fields
        ) + ", body binary"

        def attach(pdf):
            return pdf

        return self.store.map_bodies(
            meta, attach, schema,
            n_tasks=n_tasks or self.store.n_buckets,
        )

    def fetch(self, wave: DataFrame) -> DataFrame:
        """Full fetch (bodies attached) for generic callers; the engine
        prefers fetch_meta + per-branch attach_bodies."""
        return self.attach_bodies(self.fetch_meta(wave))

    def parse_pages(
        self, meta: DataFrame, extract_rules=(), carry_concat=(),
        n_tasks: int | None = None,
    ) -> DataFrame:
        """Fused read+parse: the body-read task itself runs the
        link/figure/ExtractRule extraction and returns only the parsed
        columns — html bodies never enter the JVM plan (the html analog
        of the python image sink). ``meta`` must be pre-filtered to the
        html rows. ``n_tasks`` caps the python stage width for small
        batches (bodystore._bucketed)."""
        from .extract import PARSE_EXTRA_DDL, parse_pages_kernel

        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in meta.schema.fields
        ) + ", " + PARSE_EXTRA_DDL
        return self.store.map_bodies(
            meta,
            parse_pages_kernel(extract_rules, carry_concat),
            schema,
            n_tasks=n_tasks or self.store.n_buckets,
        )


class HttpFetcher:  # aiohttp session gated; wrapper executed via factory
    """Production fetcher: Arrow-batched async HTTP via mapInPandas.

    Per-batch politeness is already enforced upstream by wave selection;
    this stage only bounds in-flight connections per task. The whole
    per-request semantics — timeouts, bounded in-fetch retries, redirect
    policy with Go's method conversion, POST/POST-M/HEAD encodings
    (`request.go:45-50`, `surf.go:112-197`, `surfer/param.go:61-144`) —
    live in the SHARED :func:`~pholcus_spark.httpfetch.async_fetch_one`
    loop, which the stdlib fetcher's live-server suite executes on
    every run (tests/test_httpfetch.py, incl. stub-session drills of
    the async surface); only the aiohttp ClientSession wiring here is
    import-gated.
    """

    def __init__(self, timeout_s: float = 120.0, max_conn_per_task: int = 16,
                 try_times: int = 3, retry_pause_s: float = 2.0,
                 redirect_times: int = 0, session_factory=None):
        # redirect policy per the reference (`surfer/param.go:130-144`):
        # 0 = unlimited, <0 = forbidden, n = at most n redirects
        self.redirect_times = redirect_times
        # session_factory(timeout_s, max_conn) -> async context manager
        # yielding an async_fetch_one-compatible session. None (the
        # default) builds an aiohttp ClientSession per task; a factory
        # lets the WHOLE mapInPandas wrapper — schema assembly, batch
        # concurrency, column plumbing — run without aiohttp (the
        # parity suite drives it over the urllib session against a
        # live server). The factory is pickled into the task closure,
        # so it must be self-contained.
        self._session_factory = session_factory
        if session_factory is None:
            try:
                import aiohttp  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "HttpFetcher requires aiohttp (not installed in this "
                    "container); use FixtureFetcher for tests/benchmarks "
                    "or inject session_factory="
                ) from e
        self.timeout_s = timeout_s
        self.max_conn_per_task = max_conn_per_task
        self.try_times = try_times
        self.retry_pause_s = retry_pause_s

    def fetch(self, wave: DataFrame) -> DataFrame:
        import asyncio

        timeout_s = self.timeout_s
        max_conn = self.max_conn_per_task
        try_times = self.try_times
        retry_pause_s = self.retry_pause_s
        redirect_times = self.redirect_times
        session_factory = self._session_factory
        from pyspark.sql.types import (
            BinaryType,
            BooleanType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        # never StructType.add on wave.schema: it mutates the frame's
        # CACHED schema in place and pyspark 4 then resolves the
        # phantom columns against the child plan
        schema = StructType(
            list(wave.schema.fields)
            + [
                StructField("status", IntegerType()),
                StructField("content_type", StringType()),
                StructField("body", BinaryType()),
                StructField("ok", BooleanType()),
            ]
        )

        def run(batches):
            import pandas as pd

            from .httpfetch import async_fetch_one

            def make_session():
                if session_factory is not None:
                    return session_factory(timeout_s, max_conn)
                import aiohttp

                conn = aiohttp.TCPConnector(limit=max_conn)
                tmo = aiohttp.ClientTimeout(total=timeout_s)
                # auto_decompress=False: decode_content is the ONE
                # decode point for both transports. aiohttp's default
                # strips Content-Encoding transparently but leaves the
                # header visible, so a payload that is ITSELF a .gz
                # file (sitemap.xml.gz served with Content-Encoding:
                # gzip) would match decode_content's magic sniff and be
                # decompressed a second time (round-5 ADVICE); with the
                # transport's decompression off the two paths cannot
                # diverge.
                return aiohttp.ClientSession(
                    connector=conn, timeout=tmo, auto_decompress=False
                )

            async def fetch_all(urls, methods, bodies, proxies, uas, hdrs):
                import json as json_mod

                async with make_session() as s:
                    # the retry/redirect/encoding loop is the SAME
                    # async_fetch_one the stdlib fetcher runs (and the
                    # live-server suite pins); aiohttp's ClientSession
                    # satisfies its session surface natively (incl. the
                    # per-request proxy= kwarg the loop forwards)
                    return await asyncio.gather(
                        *[
                            async_fetch_one(
                                s, u, m, d or "",
                                try_times=try_times,
                                retry_pause_s=retry_pause_s,
                                redirect_times=redirect_times,
                                ua=ua or "",
                                proxy=px or "",
                                extra_headers=(
                                    json_mod.loads(hj) if hj else None
                                ),
                            )
                            for u, m, d, px, ua, hj in zip(
                                urls, methods, bodies, proxies, uas, hdrs
                            )
                        ]
                    )

            for pdf in batches:
                methods = (
                    pdf["method"].tolist()
                    if "method" in pdf
                    else ["GET"] * len(pdf)
                )
                bodies_in = (
                    pdf["post_data"].tolist()
                    if "post_data" in pdf
                    else [None] * len(pdf)
                )
                proxies_in = (
                    pdf["proxy"].tolist()
                    if "proxy" in pdf
                    else [None] * len(pdf)
                )
                uas_in = (
                    pdf["ua"].tolist() if "ua" in pdf else [None] * len(pdf)
                )
                hdrs_in = (
                    pdf["hdr"].fillna("").tolist()
                    if "hdr" in pdf
                    else [""] * len(pdf)
                )
                res = asyncio.run(
                    fetch_all(
                        pdf["url"].tolist(), methods, bodies_in,
                        proxies_in, uas_in, hdrs_in,
                    )
                )
                pdf = pdf.copy()
                pdf["status"] = [r[0] for r in res]
                pdf["content_type"] = [r[1] for r in res]
                pdf["body"] = [r[2] for r in res]
                pdf["ok"] = pd.Series([r[0] < 400 for r in res])
                yield pdf

        return wave.mapInPandas(run, schema)
