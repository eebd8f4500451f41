"""Oracle semantics tests — mirror the reference's scheduler unit tests
(app/scheduler/scheduler_test.go: priority pull order :262-278,
duplicate push skipped :251-260, limit guard, failure-requeue-once
matrix.go:186-202) as pure-Python assertions on the oracle.
"""

from pholcus_spark import fixtures
from pholcus_spark.keys import request_key
from pholcus_spark.oracle import OracleConfig, crawl
from pholcus_spark.spiderspec import LinkRule, SpiderSpec, parse_keyins


def page(url, host, links=(), status=200, flaky=False, image_refs=(), depth=0):
    return {
        "url": url,
        "host": host,
        "depth": depth,
        "status": status,
        "flaky": flaky,
        "out_links": list(links),
        "image_refs": list(image_refs),
    }


HOST = "h000.test"


def seeds_for(urls, rule="list"):
    return [{"spider": "sp", "url": u, "rule": rule, "priority": 0} for u in urls]


def mk_pages(*pages_):
    return {p["url"]: p for p in pages_}


def no_robots():
    return []


def test_priority_pull_order():
    # detail (prio 1) pulled before list (prio 0) in the next wave
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=[f"http://{HOST}/p/1", f"http://{HOST}/d/0/0"]),
        page(f"http://{HOST}/p/1", HOST),
        page(f"http://{HOST}/d/0/0", HOST),
    )
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), no_robots(), SpiderSpec("sp"),
                OracleConfig(wave_window_ms=375))  # budget 1/host/wave
    urls = [o["url"] for o in res.order]
    assert urls == [
        f"http://{HOST}/p/0",
        f"http://{HOST}/d/0/0",  # priority 1 wins over earlier-seq list page
        f"http://{HOST}/p/1",
    ]


def test_duplicate_push_skipped():
    # /p/1 linked from both pages → fetched exactly once
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=[f"http://{HOST}/p/1", f"http://{HOST}/p/2"]),
        page(f"http://{HOST}/p/1", HOST),
        page(f"http://{HOST}/p/2", HOST, links=[f"http://{HOST}/p/1"]),
    )
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), no_robots(), SpiderSpec("sp"))
    urls = [o["url"] for o in res.order]
    assert urls.count(f"http://{HOST}/p/1") == 1
    assert res.dropped_dup >= 1
    assert len(res.seen) == 3


def test_same_url_two_rules_is_two_entries():
    # rule is part of the key (request.go:139-145)
    k1 = request_key("sp", "list", f"http://{HOST}/x")
    k2 = request_key("sp", "detail", f"http://{HOST}/x")
    assert k1 != k2


def test_limit_guard_counts_seeds_and_stops_enqueue():
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=[f"http://{HOST}/p/1", f"http://{HOST}/p/2", f"http://{HOST}/p/3"]),
        page(f"http://{HOST}/p/1", HOST),
        page(f"http://{HOST}/p/2", HOST),
        page(f"http://{HOST}/p/3", HOST),
    )
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), no_robots(),
                SpiderSpec("sp", limit=2))
    assert len(res.order) == 2  # seed + one child
    assert res.dropped_limit == 2


def test_flaky_failure_requeued_once_then_succeeds():
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=[f"http://{HOST}/p/1"]),
        page(f"http://{HOST}/p/1", HOST, flaky=True),
    )
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), no_robots(), SpiderSpec("sp"))
    urls = [o["url"] for o in res.order]
    assert urls.count(f"http://{HOST}/p/1") == 2  # failed then requeued
    assert request_key("sp", "list", f"http://{HOST}/p/1") in res.seen
    assert res.failed_final == []


def test_permanent_failure_requeued_once_then_final():
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=[f"http://{HOST}/d/0/0"]),
        page(f"http://{HOST}/d/0/0", HOST, status=500),
    )
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), no_robots(), SpiderSpec("sp"))
    urls = [o["url"] for o in res.order]
    assert urls.count(f"http://{HOST}/d/0/0") == 2  # tried, requeued, tried again
    key = request_key("sp", "detail", f"http://{HOST}/d/0/0")
    assert res.failed_final == [key]
    assert key not in res.seen


def test_reloadable_fetched_every_push_and_not_in_seen():
    u = f"http://{HOST}/p/1"
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=[u]),
        page(u, HOST, links=[f"http://{HOST}/p/2"]),
        page(f"http://{HOST}/p/2", HOST, links=[u]),  # re-links the reloadable URL
    )
    spec = SpiderSpec("sp", reloadable_urls=frozenset([u]))
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), no_robots(), spec)
    urls = [o["url"] for o in res.order]
    assert urls.count(u) == 2  # dedup opt-out (request.go:270-277)
    # reloadable successes are NOT recorded in success history (matrix.go:145-154)
    assert request_key("sp", "list", u) not in res.seen


def test_robots_disallow_blocks_enqueue():
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=[f"http://{HOST}/d/0/0", f"http://{HOST}/p/1"]),
        page(f"http://{HOST}/d/0/0", HOST),
        page(f"http://{HOST}/p/1", HOST),
    )
    robots = [{"host": HOST, "disallow_prefixes": ["/d/"], "crawl_delay_ms": 375}]
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), robots, SpiderSpec("sp"))
    urls = [o["url"] for o in res.order]
    assert f"http://{HOST}/d/0/0" not in urls
    assert res.dropped_robots == 1


def test_politeness_budget_splits_waves():
    # 4 pages on one host, crawl_delay=750ms, window=1500ms → 2/wave
    links = [f"http://{HOST}/p/{i}" for i in range(1, 5)]
    pages = mk_pages(
        page(f"http://{HOST}/p/0", HOST, links=links),
        *[page(u, HOST) for u in links],
    )
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": 750}]
    res = crawl(pages, {}, seeds_for([f"http://{HOST}/p/0"]), robots, SpiderSpec("sp"))
    by_step = {}
    for o in res.order:
        by_step.setdefault(o["superstep"], []).append(o["url"])
    assert all(len(v) <= 2 for v in by_step.values())
    assert len(res.order) == 5


def test_keyin_fanout():
    assert parse_keyins("<a><b><a>") == ["a", "b"]
    assert parse_keyins("solo") == ["solo"]
    pages = mk_pages(
        page(f"http://{HOST}/p/0?q=a", HOST),
        page(f"http://{HOST}/p/0?q=b", HOST),
    )
    seeds = [{"spider": "sp", "url": f"http://{HOST}/p/0?q=%keyin%",
              "rule": "list", "priority": 0, "keyin": "<a><b>"}]
    res = crawl(pages, {}, seeds, no_robots(), SpiderSpec("sp"))
    spiders = {o["spider"] for o in res.order}
    assert spiders == {"sp__a", "sp__b"}
    assert len(res.order) == 2


def test_fixture_t1_full_crawl_reaches_everything():
    corpus = fixtures.generate(fixtures.t1_spec())
    pages = corpus.pages_by_url()
    images_by_id = {i["image_id"]: i for i in corpus.images}
    res = crawl(pages, images_by_id, corpus.seeds, corpus.robots, SpiderSpec("site"))
    # ground-truth BFS reachability: ok pages reachable from seeds
    reachable = set()
    frontier_urls = [s["url"] for s in corpus.seeds]
    while frontier_urls:
        u = frontier_urls.pop()
        if u in reachable:
            continue
        reachable.add(u)
        p = pages.get(u)
        if p and p["status"] < 400:
            frontier_urls.extend(p["out_links"])
    ok_reachable = {u for u in reachable if u in pages and pages[u]["status"] < 400}
    crawled = {o["url"] for o in res.order}
    assert ok_reachable <= crawled
    # every image on a reachable (non-404) detail page fetched and captioned
    expected_imgs = {
        ref
        for u in ok_reachable
        for ref in pages[u]["image_refs"]
        if "/d/" in u
    }
    assert {i["image_id"] for i in res.images} == expected_imgs
    for img in res.images:
        assert img["caption"] == images_by_id[img["image_id"]]["caption"]
    # items carry provenance (context.go:236-240)
    assert all(i["parent_url"] for i in res.items)
    # permanent failures == exactly the reachable 404 detail pages
    bad_reachable = {u for u in reachable if u in pages and pages[u]["status"] >= 400}
    failed_urls = {o["url"] for o in res.order if o["key"] in set(res.failed_final)}
    assert failed_urls == bad_reachable
    # metrics account for every pull
    assert sum(m["wave_size"] for m in res.metrics) == len(res.order)
