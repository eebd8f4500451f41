"""Main-content extraction (commonPrase/findP, baidunews.go:183-216):
engine tree walk vs the oracle's two-pass SAX twin, branch by branch,
plus hypothesis fuzz over generated tag soup."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pholcus_spark.functions.content import common_parse, find_p
from pholcus_spark.oracle import oracle_main_content
from pholcus_spark import css


def both(html):
    a = common_parse(html)
    b = oracle_main_content(html)
    assert a == b, f"engine {a!r} != oracle {b!r} for {html!r}"
    return a


def test_h1_parent_with_p():
    # findP: h1's parent subtree has <p> -> parent's inner HTML
    out = both(
        "<html><body><div id=nav><a href=x>junk</a></div>"
        "<div class=art><h1>T</h1><p>one</p><p>two</p></div>"
        "</body></html>"
    )
    assert out == '<h1>T</h1><p>one</p><p>two</p>'


def test_climb_when_parent_has_no_p():
    # h1 wrapped in a <header> without p: climb once more
    out = both(
        "<body><div class=art><header><h1>T</h1></header>"
        "<p>body text</p></div></body>"
    )
    assert out == "<header><h1>T</h1></header><p>body text</p>"


def test_climb_terminates_at_body():
    # no <p> anywhere: climb hits body, body returned as-is
    out = both("<body><div><h1>T</h1></div><span>x</span></body>")
    assert out == "<div><h1>T</h1></div><span>x</span>"


def test_last_heading_wins():
    # reference loop overwrites info per heading: the LAST h1 decides
    out = both(
        "<body><div id=nav><h1>menu</h1></div>"
        "<div class=art><h1>real</h1><p>text</p></div></body>"
    )
    assert out == "<h1>real</h1><p>text</p>"


def test_h2_h3_fallback_order():
    out = both("<body><div><h2>T</h2><p>x</p></div></body>")
    assert out == "<h2>T</h2><p>x</p>"
    out = both("<body><div><h3>T</h3><p>x</p></div></body>")
    assert out == "<h3>T</h3><p>x</p>"
    # h2 exists -> h3 branch never reached even if h3 is "better"
    out = both(
        "<body><span><h2>a</h2></span>"
        "<div><h3>b</h3><p>x</p></div></body>"
    )
    # h2's parent <span> has no p; climb to body -> whole body html
    assert out.startswith("<span>")


def test_no_headings_reference_fallback_is_empty():
    # body.Find("body") on a sane page is an EMPTY selection ->
    # Html() == "" (the reference's own behavior, reproduced)
    assert both("<body><p>just text</p></body>") == ""
    # ...but a (degenerate) nested body is found
    out = both("<body><body><p>x</p></body></body>")
    assert out == "<p>x</p>"


def test_heading_outside_body_ignored_when_body_exists():
    out = both(
        "<h1>stray</h1><body><div><h2>in</h2><p>x</p></div></body>"
    )
    assert out == "<h2>in</h2><p>x</p>"


def test_fragment_without_body_uses_root_scope():
    # net/html would synthesize <body>; both twins treat the document
    # root as the terminal scope for fragments
    out = both("<div class=art><h1>T</h1><p>x</p></div>")
    assert out == "<h1>T</h1><p>x</p>"
    # no p anywhere in the fragment: climb exits to the document root
    out = both("<div><h1>T</h1></div><span>tail</span>")
    assert out == "<div><h1>T</h1></div><span>tail</span>"


def test_find_p_is_body_base_case():
    root = css.parse_html("<body><h1>x</h1><p>y</p></body>")
    body = css.select(root, "body")[0]
    assert find_p(body) is body


def test_tag_soup_and_entities():
    out = both(
        "<body><div><h1>a &amp; b</h1><p>c <b>d</p></div></body>"
    )
    # unclosed <b> gets its implied close where the stack popped
    assert out == "<h1>a &amp; b</h1><p>c <b>d</b></p>"


def test_void_and_selfclosed_in_buffer():
    out = both(
        '<body><div><h1>T</h1><p>x<img src="u">y</p><hr/></div></body>'
    )
    assert out == '<h1>T</h1><p>x<img src="u"/>y</p><hr/>'


_WORD = st.sampled_from(["alpha", "beta", "x & y", "<", "t"])
_TAG = st.sampled_from(["div", "span", "p", "h1", "h2", "h3", "body", "b"])


@st.composite
def _soup(draw, depth=0):
    n = draw(st.integers(0, 3 if depth < 3 else 0))
    parts = []
    for _ in range(n):
        if draw(st.booleans()):
            parts.append(draw(_WORD))
        else:
            t = draw(_TAG)
            inner = draw(_soup(depth + 1))
            closed = draw(st.sampled_from(["closed", "open", "stray"]))
            if closed == "closed":
                parts.append(f"<{t}>{inner}</{t}>")
            elif closed == "open":
                parts.append(f"<{t}>{inner}")
            else:
                parts.append(f"{inner}</{t}>")
    return "".join(parts)


@settings(max_examples=300, deadline=None)
@given(_soup())
def test_fuzz_engine_vs_sax_oracle(html):
    both(html)


def test_main_content_transform_chain_both_interpreters():
    # the rule-authoring surface: field_transforms
    # (("main_content",), ("clean_html", 5)) — exactly the reference's
    # infoStr = CleanHtml(commonPrase(ctx), 5) (baidunews.go:206) —
    # compiled by the engine, interpreted by the oracle
    from pholcus_spark.extract import compile_transforms
    from pholcus_spark.oracle import _oracle_transform_value

    ops = (("main_content",), ("clean_html", 5))
    fn = compile_transforms((("c", ops),))["c"]
    html = (
        "<body><div id=nav><h1>MENU</h1><a href=/x>junk</a></div>"
        "<div class=art><h1>Title</h1><p>first para</p>"
        "<p>second</p></div></body>"
    )
    a = fn(html)
    b = _oracle_transform_value(html, ops)
    assert a == b
    assert a == "\nTitle\nfirst para\nsecond\n"
    assert "junk" not in a and "MENU" not in a
