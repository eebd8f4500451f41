"""The samples/ spiders are real runnable user code (the porting guide
for reference rule authors) — run the gallery sample end-to-end."""

import re
import shutil
import sys
import tempfile


def test_avatar_css_sample_runs(spark):
    """The qq_avatar port: css selectors + link_fields AddQueue. All
    avatars discovered solely through rule-extracted srcs."""
    sys.path.insert(0, "samples")
    from avatar_css_spider import run

    workdir = tempfile.mkdtemp(prefix="pholcus-avatar-")
    try:
        catalog, state = run(workdir, spark=spark, n_avatars=6)
        assert state["stopped"]
        assert state["totals"]["images"] == 6
        items = catalog.read("items")
        nicks = {
            r["data"]["nickname"]
            for r in items.where("data['nickname'] IS NOT NULL").collect()
        }
        assert nicks == {f"nick {i}" for i in range(6)}
        imgs = catalog.read("images")
        assert imgs.count() == 6
        assert imgs.where("NOT valid").count() == 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_shunfeng_css_sample_matches_oracle(spark):
    """The shunfenghaitao port: chained .Eq(n)/.Last() css projections
    (shunfenghaitao.go:95-106). Engine items must equal the independent
    SAX-matcher oracle's on the same corpus — a full conformance check
    of the indexed-projection surface through the crawl loop."""
    sys.path.insert(0, "samples")
    from shunfeng_css_spider import SFHT_SPIDER, build_corpus, run

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-sfht-")
    try:
        catalog, state = run(workdir, spark=spark, n_items=4)
        assert state["stopped"]
        # 1 home + 2 sections + 8 details fetched
        assert state["totals"]["fetched"] == 11
        items = catalog.read("items")
        details = items.where("rule = '商品详情'").collect()
        assert len(details) == 8
        for r in details:
            d = r["data"]
            assert d["标题"].startswith("商品 ")
            assert d["品牌"].startswith("品 牌 Brand")  # .Eq(0)/.Eq(2) chain
            assert d["原产地"] == "原产地：美国"
            assert d["货源地"] == "货源地：香港"
            assert d["类别"] in ("奶粉", "辅食")  # @last breadcrumb
        # engine == oracle on the full items set (both css matchers)
        res = testkit.run_oracle(build_corpus(4), SFHT_SPIDER)
        eng = {
            (r.rule, r.url, tuple(sorted(r.data.items())))
            for r in items.collect()
        }
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_image_gallery_sample_runs(spark):
    sys.path.insert(0, "samples")
    from image_gallery_spider import run

    workdir = tempfile.mkdtemp(prefix="pholcus-sample-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        assert state["totals"]["images"] > 0
        items = catalog.read("items")
        # the user ExtractRule's named groups became item fields
        assert items.where("data['anchor_text'] IS NOT NULL").count() > 0
        imgs = catalog.read("images")
        assert imgs.where("NOT valid").count() == 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_export_webdataset_pipeline(spark):
    """Crawl → pair_filter → caption_dedup → shard_pairs →
    write_webdataset → read_webdataset: the full north-rule path; every
    curated pair survives the shard roundtrip with bytes + caption."""
    sys.path.insert(0, "samples")
    from export_webdataset import run

    from pholcus_spark.ops.imagecaption import read_webdataset

    workdir = tempfile.mkdtemp(prefix="pholcus-wds-pipe-")
    try:
        out, sharded = run(workdir, spark=spark)
        want = sorted(
            (r.image_id, bytes(r.bytes), r.caption)
            for r in sharded.select("image_id", "bytes", "caption").collect()
        )
        assert len(want) > 0
        back = sorted(
            (r.image_id, bytes(r.bytes), r.caption)
            for r in read_webdataset(spark, out).collect()
        )
        assert back == want
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_jiban_html_sample_matches_oracle(spark):
    """The jiban port: the @html (.Html()) projection through the full
    crawl loop (jiban.go:104). Engine items — including the serialized
    inner HTML of .articleContent — must equal the independent
    SAX-matcher oracle's on the same corpus."""
    sys.path.insert(0, "samples")
    from jiban_css_spider import JIBAN_SPIDER, build_corpus, run

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-jiban-")
    try:
        catalog, state = run(workdir, spark=spark, n_news=3)
        assert state["stopped"]
        assert state["totals"]["fetched"] == 4  # 1 list + 3 news
        items = catalog.read("items")
        news = items.where("rule = 'news'").collect()
        assert len(news) == 3
        for r in news:
            d = r["data"]
            i = int(r["url"].rsplit("/", 1)[1])
            assert d["title"] == f"新闻标题 {i}"
            assert d["time"] == f"2016-07-{i + 1:02d}"
            assert d["img_url"].endswith(f"/img/{i}-a.jpg")
            # canonical inner HTML: entity re-escaped, void img
            # self-closed, nested <b> intact
            assert d["content"] == (
                f"<p>段落一 {i} &amp; 细节</p>"
                f'<img src="http://jiban.test/img/{i}-a.jpg"/>'
                f"<p>段落二 <b>重点 {i}</b></p>"
                f'<img src="http://jiban.test/img/{i}-b.jpg"/>'
            )
        # engine == oracle on the full items set (both css matchers,
        # including both @html serializers)
        res = testkit.run_oracle(build_corpus(3), JIBAN_SPIDER)
        eng = {
            (r.rule, r.url, tuple(sorted(r.data.items())))
            for r in items.collect()
        }
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_zhihu_sample_matches_oracle(spark):
    """The zhihu_daily port (zhihu_daily.go): Temp-scoped selector
    split into two rule names, explicit-AddQueue-only enqueueing
    (follow_anchors=False — the weekly-tab decoys outside the
    [data-type='daily'] scope must NOT be crawled), relative-href
    absolutization, @eq(0)@html for .First().Html(), and frontier
    dedup of a question reachable from two index pages."""
    sys.path.insert(0, "samples")
    from zhihu_css_spider import ZHIHU_SPIDER, build_corpus, run

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-zhihu-")
    try:
        catalog, state = run(workdir, spark=spark, limit=20)
        assert state["stopped"]
        # 4 seeds (explore + 3 offset pages) + 15 distinct questions;
        # the decoys (/question/91, /question/92) never fetched
        assert state["totals"]["fetched"] == 19
        assert state["totals"]["failed"] == 0
        seen = {r.key for r in catalog.read("url_seen").collect()}
        assert len(seen) == 19
        items = catalog.read("items")
        landing = items.where("rule = '解析落地页'").collect()
        assert len(landing) == 15
        for r in landing:
            q = int(r["url"].rsplit("/", 1)[1])
            d = r["data"]
            assert d["标题"] == f"问题标题 {q}"
            assert d["提问内容"] == f"问题描述 {q} & 细节"
            # .First().Html(): first AnswerCard only, canonical form
            assert d["回答内容"] == f"<p>答案一 <b>{q}</b></p>"
        urls = {r["url"] for r in landing}
        assert not any(u.endswith(("/91", "/92")) for u in urls)
        # engine == oracle across the whole items set
        res = testkit.run_oracle(build_corpus(20), ZHIHU_SPIDER)
        eng = {
            (r.rule, r.url, tuple(sorted(r.data.items())))
            for r in items.collect()
        }
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        # oracle agrees on the url_seen membership too
        assert res.seen == seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_baidunews_xml_sample_matches_oracle(spark):
    """The baidunews port: kind="xml" RSS extraction, emit=False list
    rule, seed Temp, aliased carry_fields renames, clean_html
    transforms, SubNamespace export (baidunews.go end-to-end). Engine
    items must equal the independent expat-SAX oracle's."""
    import glob as _glob

    sys.path.insert(0, "samples")
    from baidunews_rss_spider import BAIDU_NEWS, RSS_FEEDS, build_corpus, run

    from pholcus_spark import sinks, testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-baidunews-")
    try:
        catalog, state = run(workdir, spark=spark, n_entries=3)
        assert state["stopped"]
        # 3 feeds + 9 articles fetched; only articles emit rows
        assert state["totals"]["fetched"] == 12
        items = catalog.read("items")
        rows = items.collect()
        assert {r["rule"] for r in rows} == {"新闻详情"}  # emit=False held
        assert len(rows) == 9
        by_cat = {}
        for r in rows:
            d = r["data"]
            by_cat.setdefault(d["分类"], []).append(d)
            # clean_html(4) stripped the <b> wrapper at AddQueue time
            assert d["标题"].endswith(("标题 0", "标题 1", "标题 2"))
            assert "<b>" not in d["标题"]
            assert "\n" in d["描述"]  # <br/> became a newline
            assert d["作者"].startswith("作者")
            assert d["发布时间"].startswith("2026-08-")
            # 内容: p@html + clean_html(5) — inner tags → newlines,
            # whitespace runs collapsed
            assert d["内容"] == f"正文第一段\n{d['分类']}\n" + d["标题"][-1] + "。"
        assert set(by_cat) == set(RSS_FEEDS)
        assert all(len(v) == 3 for v in by_cat.values())

        # engine == oracle (ElementTree walk vs expat SAX, both carry
        # paths, both clean_html interpreters)
        res = testkit.run_oracle(build_corpus(3), BAIDU_NEWS)
        eng = {
            (r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows
        }
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc

        # SubNamespace export: one partition per category VALUE
        out = tempfile.mkdtemp(prefix="pholcus-baidunews-csv-")
        try:
            sinks.export_items_csv(
                items,
                out,
                field_order={"新闻详情": BAIDU_NEWS.extract_rules[1].fields},
                sub_field=BAIDU_NEWS.sub_namespace_field,
            )
            subs = sorted(
                p.rsplit("sub=", 1)[1]
                for p in _glob.glob(f"{out}/rule=新闻详情/spider=*/sub=*")
            )
            assert len(subs) == 3
        finally:
            shutil.rmtree(out, ignore_errors=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_taobao_accumulate_sample_matches_oracle(spark):
    """The taobao comment-accumulator chain: json list rule -> carried
    partial -> parallel comment-page fan-out (PaginateRule.carry_fields
    = the reference's next-page `Temp: temp`, taobao.go:244-250) ->
    relational accumulate. Engine items == oracle items, and
    sinks.accumulate_items == a pure-python append-chain twin."""
    sys.path.insert(0, "samples")
    from taobao_accumulate_spider import (
        PRODUCTS,
        TAOBAO_SPIDER,
        accumulate,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-tao-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # 1 list + 3 details + 6 comment pages
        assert state["totals"]["fetched"] == 10
        items = catalog.read("items")
        rows = items.collect()
        # list rule is emit=False; detail partials + comment segments
        assert {r["rule"] for r in rows} == {"商品详情", "商品评论"}
        assert sum(r["rule"] == "商品评论" for r in rows) == sum(
            n for _t, _s, n in PRODUCTS.values()
        )

        # engine == oracle on the crawl's emitted items
        res = testkit.run_oracle(build_corpus(), TAOBAO_SPIDER)
        eng = {
            (r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows
        }
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc

        # Spark accumulate == sequential append-chain twin over the
        # oracle's items (the reference's discussAll semantics)
        twin = {}
        segs = {}
        for i in res.items:
            if i["rule"] == "商品详情":
                twin[i["data"]["itemId"]] = dict(i["data"])
            elif i["rule"] == "商品评论":
                d = i["data"]
                segs.setdefault(d["itemId"], []).append(
                    (int(d["page"]), d["comments"])
                )
        for k, lst in segs.items():
            twin[k]["comments"] = ",".join(
                s for _p, s in sorted(lst)
            )
        final = {
            r.data["itemId"]: dict(r.data)
            for r in accumulate(items).collect()
        }
        assert final == twin
        # every product's pages all arrived, in page order
        assert final["101"]["comments"] == (
            '["c101-1-1","c101-1-2"],["c101-2-1","c101-2-2"],'
            '["c101-3-1","c101-3-2"]'
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_baidusearch_sample_matches_oracle(spark):
    """The baidusearch port: keyin fan-out with %keyin_esc%
    QueryEscape, comma selector group, require_fields skip guard, and
    a same-rule-name emit=False next-page probe (per-ExtractRule
    emit). Engine == oracle on items AND url_seen."""
    sys.path.insert(0, "samples")
    from baidusearch_spider import BAIDU_SPIDER, KEYINS, build_corpus, run

    from pholcus_spark import testkit
    from pholcus_spark.extract import NOEMIT_KEY

    workdir = tempfile.mkdtemp(prefix="pholcus-baidu-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # 3 result pages per keyin, walked via the next-link probe
        assert state["totals"]["fetched"] == 6
        rows = catalog.read("items").collect()
        # require_fields dropped the empty-title / no-href decoys:
        # pn=0,10 carry 2 valid results each, pn=20 carries 1 → 5/keyin
        assert len(rows) == 5 * len(KEYINS)
        assert all(r["data"]["标题"] for r in rows)
        assert all(r["data"]["链接"] for r in rows)
        # titles passed through ("trim",) — no padding survives
        assert all(r["data"]["标题"] == r["data"]["标题"].strip() for r in rows)
        # the emit=False probe leaked nothing: no 'next' items, no marker
        assert all("next" not in r["data"] for r in rows)
        assert all(NOEMIT_KEY not in r["data"] for r in rows)
        # keyin fan-out: one spider clone per token
        assert {r["spider"] for r in rows} == {
            f"baidusearch__{k}" for k in KEYINS
        }

        res = testkit.run_oracle(build_corpus(), BAIDU_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_weibo_fans_sample_matches_oracle(spark):
    """The weibo_fans port: distributed seed_range with an hdr: Cookie
    temp, a fixture site entirely behind a require_header login wall,
    multi-hop cookie re-carry to profile children, @eq(n) projections
    and uid/url string-derivation transforms. Engine == oracle."""
    sys.path.insert(0, "samples")
    from weibo_fans_spider import (
        FANS_PER_PAGE,
        N_PAGES,
        WEIBO_SPIDER,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-weibo-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # every page sits behind the cookie wall: all fetched
        assert state["totals"]["fetched"] == N_PAGES * (1 + FANS_PER_PAGE)
        assert state["totals"]["failed"] == 0
        rows = catalog.read("items").collect()
        assert len(rows) == N_PAGES * FANS_PER_PAGE
        by_uid = {r["data"]["好友ID"]: dict(r["data"]) for r in rows}
        # uid derived by the replace chain; profile URL visited
        assert by_uid["100010"]["好友名"] == "fan-100010"
        assert by_uid["100010"]["认证"] == "认证"
        assert by_uid["100011"]["认证"] == ""
        assert by_uid["100010"]["关注"] == "101"
        assert by_uid["100010"]["粉丝"] == "102"
        assert by_uid["100010"]["微博"] == "103"
        assert by_uid["100010"]["性别"] == "男"
        assert by_uid["100011"]["性别"] == "女"
        assert by_uid["100030"]["所在地"] == "城市-100030"
        # the session header never leaks into output rows
        assert all(
            not any(k.startswith("hdr:") for k in r["data"]) for r in rows
        )

        res = testkit.run_oracle(build_corpus(), WEIBO_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_wukong_json_cursor_sample_matches_oracle(spark):
    """The wukongwenda port: nested field_json gjson paths, and cursor
    pagination — an emit=False probe walks max_behot_time off the LAST
    data element while root has_more holds, each follow-up routed back
    into the same rule. Engine == oracle on items AND url_seen."""
    sys.path.insert(0, "samples")
    from wukong_json_spider import (
        DOMAINS,
        N_PAGES,
        PER_PAGE,
        WUKONG_SPIDER,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit
    from pholcus_spark.extract import NOEMIT_KEY

    workdir = tempfile.mkdtemp(prefix="pholcus-wukong-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # every channel walks all its cursor pages
        assert state["totals"]["fetched"] == len(DOMAINS) * N_PAGES
        assert state["totals"]["failed"] == 0
        rows = catalog.read("items").collect()
        assert len(rows) == len(DOMAINS) * N_PAGES * PER_PAGE
        by_url = {r["data"]["问题url地址"]: dict(r["data"]) for r in rows}
        # nested paths landed: qid 000 from channel 0 page 0 element 0
        q = by_url["http://wukong.test/question/000/"]
        assert q["问题标题"] == "题-000"
        assert q["问题描述"] == "描述-000"
        assert q["问题回答"] == "答-000"
        # the LAST cursor page's items arrived too (the walk completed)
        assert f"http://wukong.test/question/0{N_PAGES-1}1/" in by_url
        # the probe leaked nothing
        assert all("offset" not in r["data"] for r in rows)
        assert all(NOEMIT_KEY not in r["data"] for r in rows)

        res = testkit.run_oracle(build_corpus(), WUKONG_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_zhihu_bianji_post_sample_matches_oracle(spark):
    """The zhihu_bianji port: POST-paginated API — same url seeded
    once per offset with per-seed method/post_data, reloadable_urls
    exempting the shared request key from dedup, POST-body-keyed
    fixture pages, json scalar-array msg fragments driving link
    enqueue, and @eq(0)@html landing projections. Engine == oracle."""
    sys.path.insert(0, "samples")
    from zhihu_bianji_spider import (
        OFFSETS,
        ZHIHU_BIANJI_SPIDER,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-zhihu-bianji-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # explore + one POST per offset + 3 questions + 2 articles
        assert state["totals"]["fetched"] == 1 + len(OFFSETS) + 3 + 2
        assert state["totals"]["failed"] == 0
        rows = catalog.read("items").collect()
        assert len(rows) == 5
        data = {r["data"].get("标题"): dict(r["data"]) for r in rows}
        # question page: Text() projections + First().Html()
        q = data["题-102"]
        assert q["提问内容"] == "描述-102"
        assert q["回答内容"] == "<p>答-102</p>"  # @eq(0)@html, not 次答
        # article page: Html() projections over compound-class selectors
        a = data["文-201"]
        assert a["内容"] == "<p>正文-201</p>"
        # every landing page arrived through its routed rule
        assert {r.rule for r in rows} == {"解析知乎问答落地页", "解析知乎文章落地页"}

        res = testkit.run_oracle(build_corpus(), ZHIHU_BIANJI_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_zolpc_out_rule_sample_matches_oracle(spark):
    """The zolpc port: ctx.Parse re-dispatch — an ExtractRule bound to
    the page's rule ("生成请求") emits its items under out_rule
    ("获取结果"), the SetRuleName provenance (context.go:356-374,
    zolpc.go:60-65). tr[id] row filter, @eq(k) chained projections,
    unconditional URL-prefix transform. Engine == oracle."""
    sys.path.insert(0, "samples")
    from zolpc_spider import PAGES, ZOLPC_SPIDER, build_corpus, run

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-zolpc-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        assert state["totals"]["fetched"] == len(PAGES)
        rows = catalog.read("items").collect()
        # 2 id-rows per page + the degenerate third-page row; the
        # no-id header row never extracts
        assert len(rows) == 2 * len(PAGES) + 1
        # ctx.Parse relabel: every item lands under the DELEGATED rule
        assert {r.rule for r in rows} == {"获取结果"}
        # no marker keys leak into the data map
        assert all(all(not k.startswith("\x00") for k in r.data) for r in rows)
        data = {r["data"]["主题"]: dict(r["data"]) for r in rows}
        full = data["题-101"]
        assert full == {
            "机型": "类-1A",
            "链接": "http://bbs.zol.com.cn/sjbbs/d544_t101.html",
            "主题": "题-101",
            "发表者": "user1a",
            "发表时间": "2016-01-01",
            "总回复": "11",
            "总查看": "101",
            "最后回复者": "last1a",
            "最后回复时间": "2016-01-02",
        }
        # degenerate row: missing projections → '' (goquery empty
        # selection), prefix transform still applies to the empty url
        degen = data["题-303"]
        assert degen["链接"] == "http://bbs.zol.com.cn/"
        assert degen["最后回复时间"] == ""
        assert degen["最后回复者"] == "last3c"

        res = testkit.run_oracle(build_corpus(), ZOLPC_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_carhome_sample_matches_oracle(spark):
    """The car_home port: require_equals conditional page walk (the
    current-page marker must equal the carried Temp p), int_add+prefix
    next-URL derivation, @each(|) anchor-title accumulation with
    empty-slot collapse, and @each() multi-selection Text(). Engine ==
    oracle on items AND url_seen; the redirect-past-last-page probe
    page fetches but expands nothing."""
    sys.path.insert(0, "samples")
    from carhome_spider import (
        CARHOME_SPIDER,
        N_LIST_PAGES,
        THREADS_PER_PAGE,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-carhome-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # pages 1..N fetched plus the cur-mismatch page N+1 (fetched,
        # probe dropped) plus every thread
        assert state["totals"]["fetched"] == (
            N_LIST_PAGES + 1 + N_LIST_PAGES * THREADS_PER_PAGE
        )
        rows = catalog.read("items").collect()
        assert len(rows) == N_LIST_PAGES * THREADS_PER_PAGE
        for r in rows:
            d = r["data"]
            # Split("当前积分：")[1] — digits only
            assert d["当前积分"].isdigit()
            # the Each-loop join: exactly the two titled car anchors,
            # stat/所属/leftimgs slots collapsed away
            assert d["关注的车"].count("|") == 1
            assert d["关注的车"].startswith("车型A")
            assert "品牌" not in d["关注的车"]  # 所属 row skipped
            assert d["注册时间"].startswith("2015-")
            # multi-selection Text(): every .conleft@eq(0) anchor text
            assert d["作者"].startswith("用户")
            assert d["作者"].endswith("A品牌文字B")
        res = testkit.run_oracle(build_corpus(), CARHOME_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_kaola_sample_matches_oracle(spark):
    """The kaola port: item_slice=(1,) skipping the Each loop's i==0
    home tab, href-IsSome require guard, and the two-hop goodsType
    temp relay (producer carry → list re-carry → detail temp_fields).
    Engine == oracle on items AND url_seen."""
    sys.path.insert(0, "samples")
    from kaola_spider import (
        GOODS_PER_SECTION,
        KAOLA_SPIDER,
        SECTIONS,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-kaola-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # home + sections + products; the skipped tab and the
        # hrefless tab never crawl
        n_products = len(SECTIONS) * GOODS_PER_SECTION
        assert state["totals"]["fetched"] == 1 + len(SECTIONS) + n_products
        rows = catalog.read("items").collect()
        assert len(rows) == n_products
        by_type = {}
        for r in rows:
            by_type.setdefault(r["data"]["goodsType"], 0)
            by_type[r["data"]["goodsType"]] += 1
        # goodsType survived BOTH hops (tab → list → detail)
        assert by_type == {s: GOODS_PER_SECTION for s in SECTIONS}
        res = testkit.run_oracle(build_corpus(), KAOLA_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_jd_sample_matches_oracle(spark):
    """The jd port (jdSpider.go; lewa.go is a byte-identical copy):
    page_count scanned from ALL script tags via @each()@text +
    regex_find, then TWO PaginateRules with page_expr (2,-1)/(2,0)
    generating the odd /Search and even /s_new.php page pairs. Engine
    == oracle on items AND url_seen."""
    sys.path.insert(0, "samples")
    from jd_spider import ITEMS_PER_PAGE, JD_SPIDER, build_corpus, run

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-jd-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # seed + 6 generated pages (the odd i=1 child IS the seed URL
        # again, refetched under 搜索结果 — distinct dedup key)
        assert state["totals"]["fetched"] == 7
        rows = catalog.read("items").collect()
        # result pages 2..6 carry items; page 1 is the script page and
        # the titleless decoys are guarded out
        assert len(rows) == 5 * ITEMS_PER_PAGE
        assert all(r["data"]["链接"].startswith("http://item.jd.test/")
                   for r in rows)
        assert all(r["data"]["标题"].startswith("商品 ") for r in rows)
        odd = [r for r in rows if "/Search" in r["url"]]
        even = [r for r in rows if "/s_new.php" in r["url"]]
        assert len(odd) == 2 * ITEMS_PER_PAGE  # pages 3, 5
        assert len(even) == 3 * ITEMS_PER_PAGE  # pages 2, 4, 6
        res = testkit.run_oracle(build_corpus(), JD_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_fixture_fetcher_rejects_duplicate_page_rows(spark):
    """A duplicate (url, post_data) fixture row would double every
    wave row through the fetch left-join and drift the scheduler's
    queued counter (the run then never terminates) — the fetcher must
    fail loudly at construction instead."""
    import pytest

    from pholcus_spark.fetch import FixtureFetcher

    pages = spark.createDataFrame(
        [
            ("http://h.test/a", "h.test", 200, False, "text/html", b"x"),
            ("http://h.test/a", "h.test", 200, False, "text/html", b"y"),
        ],
        "url string, host string, status int, flaky boolean, "
        "content_type string, body binary",
    )
    with pytest.raises(ValueError, match="duplicate page row"):
        FixtureFetcher(pages)


def test_chinanews_sample_matches_oracle(spark):
    """The chinanews port: pagination nav fan-out, 3-value Temp carry
    renamed onto output columns, mixed protocol-relative/site-relative
    hrefs through absolutization, and the strings.Cut 来源 chain
    (regex_find + replace + trim + default 未知). Engine == oracle."""
    sys.path.insert(0, "samples")
    from chinanews_spider import (
        CHINANEWS_SPIDER,
        N_LIST_PAGES,
        NEWS_PER_PAGE,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-chinanews-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # news1 fetches twice: once as the seed (滚动新闻 reads only
        # the nav) and once via its own pagebox link under 新闻列表
        n_details = N_LIST_PAGES * NEWS_PER_PAGE
        assert state["totals"]["fetched"] == 1 + N_LIST_PAGES + n_details
        rows = catalog.read("items").collect()
        assert len(rows) == n_details
        for r in rows:
            d = r["data"]
            assert d["类别"] == "社会"
            assert d["来源"] in ("某网", "某社")  # Cut + strip + trim
            assert "参与互动" not in d["来源"]
            assert d["标题"].startswith("标题 ")
            assert d["内容"].startswith("正文 ")
        res = testkit.run_oracle(build_corpus(), CHINANEWS_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_people_sample_matches_oracle(spark):
    """The people port: a kind="json" index (json.Unmarshal of
    index.js) fanning one detail request per array element with the
    four-temp AddQueue map, landed as output columns by temp_fields.
    Engine == oracle."""
    sys.path.insert(0, "samples")
    from people_spider import N_NEWS, PEOPLE_SPIDER, build_corpus, run

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-people-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        assert state["totals"]["fetched"] == 1 + N_NEWS
        rows = catalog.read("items").collect()
        assert len(rows) == N_NEWS
        for r in rows:
            d = r["data"]
            assert d["ID"].isdigit()
            assert d["类别"] in ("1001", "1002")
            assert d["ReleaseTime"].startswith("2018-08-")
            assert d["内容"].startswith("人民网正文")
        res = testkit.run_oracle(build_corpus(), PEOPLE_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_area_codes_sample_matches_oracle(spark):
    """The area_codes port: the recursive division walk as level-bound
    rules — const_fields level literals, the short-code parent relay
    (carry → temp → 上级 column), td-pair and villagetr-triple row
    projections. Engine == oracle on all three levels."""
    sys.path.insert(0, "samples")
    from area_codes_spider import (
        AREA_SPIDER,
        CITIES_PER_PROVINCE,
        N_PROVINCES,
        VILLAGES_PER_CITY,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-areacodes-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        n_cities = N_PROVINCES * CITIES_PER_PROVINCE
        assert state["totals"]["fetched"] == 1 + N_PROVINCES + n_cities
        rows = catalog.read("items").collect()
        by_level = {}
        for r in rows:
            by_level.setdefault(r["data"]["级别"], []).append(r["data"])
        assert len(by_level["0"]) == N_PROVINCES
        assert len(by_level["1"]) == n_cities
        assert len(by_level["2"]) == n_cities * VILLAGES_PER_CITY
        # the parent relay: every city's 上级 is a province short code,
        # every village's 上级 is its city's short code
        assert {d["上级"] for d in by_level["0"]} == {"0"}
        assert {d["上级"] for d in by_level["1"]} == {
            str(p) for p in range(11, 11 + N_PROVINCES)
        }
        for d in by_level["2"]:
            assert d["代码"].startswith(d["上级"])
        res = testkit.run_oracle(build_corpus(), AREA_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_ganji_sample_matches_oracle(spark):
    """The ganji_gongsi port (the reference repo's own 典型规则示例):
    the require_equals page walk, the label-dispatch Each loop as one
    @each blob re-read by six regex_find columns, and FileOutput with
    a Temp-derived name (公司 carried onto the images caption). Engine
    == oracle on items, images AND url_seen."""
    sys.path.insert(0, "samples")
    from ganji_spider import (
        COMPANIES_PER_PAGE,
        GANJI_SPIDER,
        N_LIST_PAGES,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-ganji-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        n_companies = N_LIST_PAGES * COMPANIES_PER_PAGE
        # list pages + the cur-mismatch probe + companies + phone PNGs
        assert state["totals"]["fetched"] == (
            N_LIST_PAGES + 1 + 2 * n_companies
        )
        rows = catalog.read("items").collect()
        assert len(rows) == n_companies
        for r in rows:
            d = r["data"]
            assert d["公司"].startswith("晨光文具")
            assert "推广" not in d["公司"]      # triple-space cut
            assert d["规模"].endswith("人")
            assert d["地址"].startswith("深圳市")
            assert "地图" not in d["地址"]
            assert d["简介"].startswith("主营文具批发")
        imgs = catalog.read("images").collect()
        assert len(imgs) == n_companies
        assert all(i.valid for i in imgs)
        # the FileOutput name carry: every phone image captioned with
        # its company (ganji_gongsi.go:124 Temp{"n": 公司+...})
        assert {i.caption for i in imgs} == {d["data"]["公司"] for d in rows}
        res = testkit.run_oracle(build_corpus(), GANJI_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        # image set + captions agree with the oracle too
        eng_imgs = {(i.url, i.caption) for i in imgs}
        orc_imgs = {(i["url"], i["caption"]) for i in res.images}
        assert eng_imgs == orc_imgs
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_alibaba_sample_matches_oracle(spark):
    """The alibaba port: %keyin_gbk% seed token (percent-escaped GBK,
    substituted in the temp'd paginate base too), gbk-served bodies
    through the transcode path, the two structurally-exclusive
    branches (data-total-page paginate vs typemore category fallback),
    and ctx.Parse via out_rule. Engine == oracle."""
    sys.path.insert(0, "samples")
    from alibaba_spider import (
        ALIBABA_SPIDER,
        ITEMS_PER_PAGE,
        KEYIN_PAGED,
        KEYIN_REDIR,
        TOTAL_PAGES,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-alibaba-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # paged keyin: seed + pages 2..TOTAL; redirect keyin: seed +
        # 2 categories
        assert state["totals"]["fetched"] == (TOTAL_PAGES) + (1 + 2)
        rows = catalog.read("items").collect()
        by_spider = {}
        for r in rows:
            by_spider.setdefault(r["spider"], []).append(r)
        paged = by_spider[f"alibaba__{KEYIN_PAGED}"]
        redir = by_spider[f"alibaba__{KEYIN_REDIR}"]
        assert len(paged) == TOTAL_PAGES * ITEMS_PER_PAGE
        assert len(redir) == 2 * ITEMS_PER_PAGE
        # every item decoded from gbk correctly and relabeled 搜索结果
        assert {r["rule"] for r in rows} == {"搜索结果"}
        assert all(r["data"]["地址"] == "广东 深圳" for r in rows)
        assert all(r["data"]["公司"].startswith("公司") for r in rows)
        res = testkit.run_oracle(build_corpus(), ALIBABA_SPIDER)
        eng = {
            (r.spider, r.rule, r.url, tuple(sorted(r.data.items())))
            for r in rows
        }
        orc = {
            (i.get("spider") or "", i["rule"], i["url"],
             tuple(sorted(i["data"].items())))
            for i in res.items
        }
        # oracle items may not carry spider; compare modulo when absent
        if any(s == "" for s, *_ in orc):
            eng = {t[1:] for t in eng}
            orc = {t[1:] for t in orc}
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_holland_sample_matches_oracle(spark):
    """The hollandandbarrett port: regex count-carve with nested named
    groups (one capture → three fields: the count, the temp-composed
    sweep URL, the N=="0" stop guard), gjson numeric ordinals through
    the deep records nesting, fmt.Sprint bracket trims, nil→"0"
    default, and a two-hop type carry. Engine == oracle."""
    sys.path.insert(0, "samples")
    from holland_spider import HOLLAND_SPIDER, SECTIONS, build_corpus, run

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-holland-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        live = [s for s in SECTIONS if s[2] > 0]
        # home + one probe per section + one sweep per NON-empty one
        assert state["totals"]["fetched"] == 1 + len(SECTIONS) + len(live)
        rows = catalog.read("items").collect()
        assert len(rows) == sum(n for _p, _t, n in live)
        by_type = {}
        for r in rows:
            by_type.setdefault(r["data"]["分类"], []).append(r["data"])
        assert {t for _p, t, n in live} == set(by_type)
        for _p, t, n in live:
            assert len(by_type[t]) == n
        for r in rows:
            d = r["data"]
            assert "[" not in d["标题"] and '"' not in d["标题"]
            assert d["星级"].isdigit()  # nil → "0"
            assert d["原价"].endswith(".49")
        res = testkit.run_oracle(build_corpus(), HOLLAND_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_ijguc_sample_matches_oracle(spark):
    """The IJGUC port: the 1..7 id loop as one selector group, the
    td-Eq(1)/table-Eq(1)/k%2 ordinal walk as nth-child containers +
    item_slice step, and the Label:(.*?)Next: regex ladder over one
    #col1 projection (with the Address(es) fallback alternation).
    Engine == oracle."""
    sys.path.insert(0, "samples")
    from ijguc_spider import (
        ARTICLES_PER_ISSUE,
        IJGUC_SPIDER,
        N_ISSUES,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-ijguc-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        n_articles = N_ISSUES * ARTICLES_PER_ISSUE
        # index + live issue pages + kept (even-ordinal) articles; the
        # PDF decoys and the empty eventbody slots never crawl
        assert state["totals"]["fetched"] == 1 + N_ISSUES + n_articles
        rows = catalog.read("items").collect()
        assert len(rows) == n_articles
        for r in rows:
            d = r["data"]
            assert d["Title"].strip().startswith("Grid Paper")
            assert d["Journal"].strip() == "IJGUC Vol 7"
            assert d["DOI"].startswith("10.1504/IJGUC.2016.")
            assert d["Author"].strip().startswith("A. Researcher")
        res = testkit.run_oracle(build_corpus(), IJGUC_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_google_sample_matches_oracle(spark):
    """The googlesearch port: the sequential mirror probe as a
    PARALLEL seed race (dead mirrors land in the failure history, the
    live one proceeds), the resultStats ceil_div/limit arithmetic,
    page_expr=(10,0) start offsets, TrimLeft cutset semantics and
    ctx.Parse via out_rule. Engine == oracle incl. failures."""
    sys.path.insert(0, "samples")
    from google_spider import (
        GOOGLE_SPIDER,
        LIMIT,
        MIRRORS,
        RESULTS_PER_PAGE,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-google-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # live probe + LIMIT-1 offset pages fetched; 2 dead mirrors
        assert state["totals"]["fetched"] == 1 + (LIMIT - 1)
        assert state["totals"]["failed"] >= 2
        rows = catalog.read("items").collect()
        # the probe page itself parses as search_results (ctx.Parse)
        assert len(rows) == LIMIT * RESULTS_PER_PAGE
        assert {r["rule"] for r in rows} == {"search_results"}
        for r in rows:
            d = r["data"]
            assert d["href"].startswith("http://site")  # TrimLeft'd
            assert d["title"].startswith("Result ")
        fails = {r.key for r in catalog.read("failures_final").collect()}
        assert len(fails) == len(MIRRORS) - 1
        res = testkit.run_oracle(build_corpus(), GOOGLE_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        assert fails == set(res.failed_final)
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_taobaosearch_sample_matches_oracle(spark):
    """The taobaosearch port: carve (regex pre-step) + kind=json over
    an embedded auctions array, the totalCount ceil((N-4)/44)/limit
    page arithmetic with s=44i offsets, a five-field CreateItem carry,
    and UpsertItemField as dynamic_kv — runtime item columns differing
    per product. Engine == oracle; the CSV sink appends the sorted
    union of dynamic columns after the declared ItemFields."""
    import csv
    import glob

    sys.path.insert(0, "samples")
    from taobaosearch_spider import (
        AUCTIONS_PER_PAGE,
        LIMIT,
        TBS_SPIDER,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit
    from pholcus_spark.sinks import export_items_csv

    workdir = tempfile.mkdtemp(prefix="pholcus-tbs-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # count page + 2 generated pages + details
        n_details = LIMIT * AUCTIONS_PER_PAGE
        assert state["totals"]["fetched"] == LIMIT + n_details
        rows = catalog.read("items").collect()
        assert len(rows) == n_details
        for r in rows:
            d = r["data"]
            assert d["标题"].startswith("机械键盘")   # carried statics
            assert d["品牌"].startswith("雷柏")       # dynamic column
            assert d["连接方式"] == "有线"
            assert "_ks" not in d and "_vs" not in d  # sources dropped
            # fullwidth-space padding trimmed on the padded row
            if "轴体" in d:
                assert d["轴体"] == d["轴体"].strip(" 　")
        # the two runtime columns are product-dependent
        assert any("键数" in r["data"] for r in rows)
        assert any("轴体" in r["data"] for r in rows)
        res = testkit.run_oracle(build_corpus(), TBS_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
        # sink contract: declared ItemFields first, then the SORTED
        # union of runtime columns (the deterministic UpsertItemField
        # append, context.go:246-253)
        out = tempfile.mkdtemp(prefix="pholcus-tbs-csv-")
        try:
            export_items_csv(
                catalog.read("items"), out,
                field_order=TBS_SPIDER.item_fields(),
                dynamic_rules=("商品详情",),
            )
            csvs = glob.glob(f"{out}/rule=商品详情/**/*.csv", recursive=True)
            assert csvs
            with open(csvs[0], newline="") as fh:
                header = next(csv.reader(fh))
            # spider is a partition column (partitionBy), not a file
            # column — declared ItemFields lead the header
            assert header[:5] == ["标题", "价格", "销量", "店铺", "发货地"]
            dyn = header[5 : header.index("Url")]
            assert dyn == sorted(dyn)
            assert set(dyn) == {"品牌", "连接方式", "键数", "轴体"}
        finally:
            shutil.rmtree(out, ignore_errors=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_wangyi_sample_matches_oracle(spark):
    """The wangyi port: the urls_top rank-map accumulation — the
    reference's driver-local Go map as carry_concat (page-local merge
    of duplicate links' carries in tab order), per-tab topTit[n] label
    rules with item_slice header skips, a ^root-anchored page-title
    field inside row rules, and the full-text redirect as a
    require/forbid branch pair with Temp re-carry. Engine == oracle."""
    sys.path.insert(0, "samples")
    from wangyi_spider import (
        N_BOARDS,
        TOP_TITLES,
        WANGYI_SPIDER,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-wangyi-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # hub + boards + 3 articles per board + 1 full-text per board
        assert state["totals"]["fetched"] == 1 + N_BOARDS + N_BOARDS * 4
        rows = catalog.read("items").collect()
        assert len(rows) == N_BOARDS * 3
        hot = [r for r in rows if r["url"].endswith("0.html")]
        assert len(hot) == N_BOARDS
        for r in hot:
            # the accumulation: the hot article ranks in EVERY tab, in
            # tab order (wangyi.go:87 urls_top[url] += ...)
            ranks = r["data"]["排名"]
            assert ranks == "".join(
                f"{t}:{n + 1}," for n, t in enumerate(TOP_TITLES)
            )
        for r in rows:
            d = r["data"]
            assert d["类别"] == "新闻榜单"     # ^root-anchored field
            assert d["ReleaseTime"].startswith("2016-07-")
            assert "来源" not in d["ReleaseTime"]
            # paged articles output only via their -all full page
            if "-all" not in r["url"]:
                assert not r["url"].endswith("1.html")
        res = testkit.run_oracle(build_corpus(), WANGYI_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_jdsearch_sample_matches_oracle(spark):
    """The jdsearch port (jdsearch.go — distinct from jingdong's
    jdSpider.go): keyin fan-out seeds pages 1+2, the GetLimit clamp
    (max_pages = LIMIT-1) bounds the dual page_expr expansion at pages
    3..6 (clamp decoys live on pages 7/8), and ctx.Parse re-dispatch
    (out_rule) makes the seed pages emit under 搜索结果 alongside the
    children. Engine == oracle on items AND url_seen."""
    sys.path.insert(0, "samples")
    from jdsearch_spider import (
        ITEMS_PER_PAGE,
        JDSEARCH_SPIDER,
        KEYINS,
        LIMIT,
        TOTAL,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-jdsearch-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # per keyin: seeds 1,2 + clamped expansion 3..6 (i walks
        # 1..min(TOTAL,LIMIT)-1 → 2i+1/2i+2); 7/8 must stay unfetched
        n_pages = 2 + 2 * (min(TOTAL, LIMIT) - 1)
        assert state["totals"]["fetched"] == len(KEYINS) * n_pages
        rows = catalog.read("items").collect()
        assert len(rows) == len(KEYINS) * n_pages * ITEMS_PER_PAGE
        assert all(r.rule == "搜索结果" for r in rows)
        for r in rows:
            d = r["data"]
            assert d["标题"].startswith("商品 ")      # tag-strip + trim
            assert d["链接"].endswith(".html")
            assert d["价格"].endswith(".90")          # @data-price attr
            assert d["评论数"].isdigit()              # first digit run
            assert d["星级"] in set("01234")          # class-attr digits
            assert "DECOY" not in d["标题"]           # :nth-child(1) skip
        pages_seen = {int(r.url.split("page=")[1].split("&")[0])
                      for r in rows}
        assert pages_seen == {1, 2, 3, 4, 5, 6}       # clamp: no 7/8
        res = testkit.run_oracle(build_corpus(), JDSEARCH_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_lewa_sample_matches_oracle(spark):
    """The lewa port (lewa.go — the "京东搜索new" variant): page_count
    probed from the joined <script> texts (@each), int_add(-1) bounds
    the dual page_expr expansion at pages 2..6 (off-by-one decoys live
    on 7/8), the probe page's own grid is never emitted (emit=False),
    and the tag-strip + empty-title guard run per item. Engine ==
    oracle on items AND url_seen."""
    sys.path.insert(0, "samples")
    from lewa_spider import (
        ITEMS_PER_PAGE,
        KEYINS,
        LEWA_SPIDER,
        PAGE_COUNT,
        build_corpus,
        run,
    )

    from pholcus_spark import testkit

    workdir = tempfile.mkdtemp(prefix="pholcus-lewa-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        # per keyin: the probe + odd 1,3,5 + even 2,4,6 (i walks
        # 1..PAGE_COUNT-1; the regenerated page 1 is a DIFFERENT
        # request from the probe — Unique() keys on spider+rule+url,
        # request.go:139-145); 7/8 stay unfetched
        n_result_pages = 2 * (PAGE_COUNT - 1)
        assert state["totals"]["fetched"] == len(KEYINS) * (1 + n_result_pages)
        rows = catalog.read("items").collect()
        # the probe page's grid (page 1) must NOT be in the output —
        # 判断页数 never calls ctx.Output (lewa.go:61-76)
        assert len(rows) == len(KEYINS) * n_result_pages * ITEMS_PER_PAGE
        assert all(r.rule == "搜索结果" for r in rows)
        for r in rows:
            d = r["data"]
            # tag-strip removed the unescaped <热> and trim ate the
            # \n/\t padding: "商品NN  " collapses to a clean prefix
            assert d["标题"].startswith("商品")
            assert "<" not in d["标题"] and "\t" not in d["标题"]
            assert d["链接"].startswith("http://item.lewa.test/")
            assert d["价格"].endswith(".00")
            assert d["评论数"].isdigit()
            assert "DECOY" not in d["标题"]
        pages_seen = {
            int(re.search(r"page=(\d+)", r.url).group(1)) for r in rows
        }
        assert pages_seen == {1, 2, 3, 4, 5, 6}
        res = testkit.run_oracle(build_corpus(), LEWA_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_zol_variant_samples(spark):
    """zolphone/zolslab (zolphone.go, zolslab.go) are the zolpc rule at
    other boards — same ParseFunc, different name/path/loop bound. The
    phone variant runs end-to-end against the oracle; the tablet
    variant's spec and corpus pin the parametrization."""
    sys.path.insert(0, "samples")
    import dataclasses

    from zolphone_spider import NAME as PHONE, ZOLPHONE_SPIDER, run
    from zolslab_spider import NAME as SLAB, ZOLSLAB_SPIDER
    from zolpc_spider import ZOLPC_SPIDER, build_corpus

    from pholcus_spark import testkit

    # the three specs differ ONLY in spider name (byte-identical Go
    # ParseFuncs → one shared rule body)
    for spec, nm in ((ZOLPHONE_SPIDER, PHONE), (ZOLSLAB_SPIDER, SLAB)):
        assert spec.name == nm
        assert dataclasses.replace(spec, name=ZOLPC_SPIDER.name) == ZOLPC_SPIDER
    slab_corpus = build_corpus(SLAB)
    assert all("/padbbs/p" in s["url"] for s in slab_corpus.seeds)

    workdir = tempfile.mkdtemp(prefix="pholcus-zolphone-")
    try:
        catalog, state = run(workdir, spark=spark)
        assert state["stopped"]
        rows = catalog.read("items").collect()
        assert rows and all(r.rule == "获取结果" for r in rows)
        assert all("/sjbbs/d544_p" in r.url for r in rows)
        res = testkit.run_oracle(build_corpus(PHONE), ZOLPHONE_SPIDER)
        eng = {(r.rule, r.url, tuple(sorted(r.data.items()))) for r in rows}
        orc = {
            (i["rule"], i["url"], tuple(sorted(i["data"].items())))
            for i in res.items
        }
        assert eng == orc
        seen_eng = {r.key for r in catalog.read("url_seen").collect()}
        assert seen_eng == res.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
