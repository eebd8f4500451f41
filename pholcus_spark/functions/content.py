"""Main-content extraction — the reference's generic news-body
heuristic (`sample/static_rules/baidunews/baidunews.go:183-216`
``commonPrase``/``findP``), the last goquery idioms the DSL could not
express (``.Is("body")``, ``.Parent()``).

The reference walks up from the page's LAST ``<h1>`` (else ``<h2>``,
else ``<h3>``) to the nearest ancestor whose subtree contains a
``<p>``, and returns that ancestor's inner HTML — a tiny
readability-style boilerplate stripper: navigation/sidebar headings
climb out to a junk-free article container, everything else on the
page is dropped. Callers chain ``CleanHtml(_, 5)`` after it exactly
like the reference (baidunews.go:206) — here that is the
``("main_content",), ("clean_html", 5)`` transform chain.

Two-implementation contract: this module is the ENGINE twin (tree walk
over the css.py DOM, runs inside Arrow-batched UDFs); the conformance
oracle evaluates the same semantics with an independent two-pass SAX
algorithm (no tree — ancestor-chain snapshots + subtree-has-p flags on
a stack, ``oracle.oracle_main_content``), and the two are
hypothesis-fuzzed against each other.

One deliberate mapping note: goquery parses with x/net/html, which
SYNTHESIZES ``<html><body>`` around any fragment, so the reference's
``findP`` recursion always terminates at ``body``. ``html.parser``
does not synthesize elements, so on a document with no ``<body>`` tag
the synthetic ``#root`` node plays the body's terminal role (both
twins agree); on well-formed pages the behavior is identical to the
reference.
"""

from __future__ import annotations

from .. import css as css_mod

__all__ = ["find_p", "common_parse"]

_P_SEL = css_mod.compile_selector("p")


def _is_terminal(node, has_body: bool) -> bool:
    # body, or — when the document never had a body — the synthetic
    # document root (net/html would have synthesized <body> there)
    if node.tag == "body":
        return True
    return not has_body and node.tag == "#root"


def find_p(node, has_body: bool = True):
    """``findP`` (baidunews.go:210-216): climb ancestors until the
    current node IS body (returned as-is), or the parent's subtree
    contains a ``<p>`` (parent returned). Iterative — the reference's
    recursion, without the stack."""
    while True:
        if _is_terminal(node, has_body):
            return node
        parent = node.parent
        if parent is None:  # detached fragment top — terminal
            return node
        if css_mod.select(parent, _P_SEL):
            return parent
        node = parent


def common_parse(html: str) -> str:
    """``commonPrase`` (baidunews.go:183-208): inner HTML of the
    main-content container — ``findP`` from the LAST ``<h1>`` (else
    last ``<h2>``, else last ``<h3>``) under body; with no headings at
    all, the reference's ``body.Find("body")`` (a body NESTED inside
    body — empty on sane pages, hence ``""``). The trailing
    ``CleanHtml(_, 5)`` is the caller's transform chain, not ours."""
    root = css_mod.parse_html(html)
    # one document-order walk: the last h1/h2/h3 inside body (and, for
    # the no-body fragment case, anywhere), plus the first body NESTED
    # inside body (the reference's body.Find("body") fallback target)
    has_body = False
    last_in_body: dict = {"h1": None, "h2": None, "h3": None}
    last_any: dict = {"h1": None, "h2": None, "h3": None}
    nested_body = None
    # explicit-stack preorder (document order): list-middle insertion
    # (`order[i:i] = kids`) would be O(n²) element moves on a
    # 10^4-node page inside this Arrow-batched UDF hot path
    stack: list = [
        (c, False)
        for c in reversed(root.children)
        if isinstance(c, css_mod.HtmlNode)
    ]
    while stack:
        node, under = stack.pop()
        if node.tag == "body":
            has_body = True
            if under and nested_body is None:
                nested_body = node
            under = True
        elif node.tag in last_any:
            last_any[node.tag] = node
            if under:
                last_in_body[node.tag] = node
        stack.extend(
            (c, under)
            for c in reversed(node.children)
            if isinstance(c, css_mod.HtmlNode)
        )
    heads = last_in_body if has_body else last_any
    for level in ("h1", "h2", "h3"):
        if heads[level] is not None:
            # the reference loop overwrites info per heading: last wins
            return css_mod.node_html(find_p(heads[level], has_body))
    return css_mod.node_html(nested_body) if nested_body else ""
