"""Minimal CSS-selector engine over a stdlib-parsed DOM — the
``kind="css"`` ExtractRule backend.

Reference surface: goquery's ``Find/Attr/Text``
(``common/goquery/traversal.go:23-402``, ``common/goquery/property.go``),
the form every reference sample rule is written in — e.g.
``sample/static_rules/qq_avatar/avatar.go:92-93``
``query.Find("#dv_an span img")`` then ``.Attr("src")``.

Supported selector subset (what the reference samples actually use):

- type selectors (``img``), universal (``*``)
- ``#id``, ``.class`` (multiple), ``[attr]``, ``[attr=value]``
  (quoted or bare), compounds thereof (``span.name[data-x=1]``)
- descendant combinator (whitespace) and child combinator (``>``)
- selector groups (``a, b`` — union, document order, deduped)
- ``:nth-child(n)`` and ``:first-child`` (the pseudo-classes the
  reference rules use that are decidable at element start — see
  ``_SUPPORTED_PSEUDOS``)

Projections mirror goquery: :func:`node_text` concatenates every
descendant text node (``property.go`` ``Text()``); :func:`node_attr`
returns an attribute or ``None`` (``Attr()``); :func:`node_html`
re-serializes the element's children — goquery ``Html()``
(``property.go``'s ``html.Render`` over the first element's child
nodes) — in a canonical form (lowercase tags/attr names, first
attribute occurrence wins, ``&<>"`` escaped, void elements
self-closed, comments dropped) shared bit-for-bit with the oracle's
SAX serializer so the two independent engines stay comparable.

Parsing is tolerant of real-world tag soup the same way x/net/html is:
unknown/unclosed tags never raise; a mismatched end tag pops to the
nearest matching open element or is ignored. This module is pure
Python with zero Spark imports — it runs inside Arrow-batched pandas
UDFs (extract.py), never as a per-row Python UDF in a Spark plan.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = [
    "HtmlNode",
    "parse_html",
    "compile_selector",
    "select",
    "node_text",
    "node_attr",
    "node_html",
]

# HTML void elements: never pushed onto the open-element stack
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class HtmlNode:
    """One element: tag, attrs (first occurrence wins, lowercased
    names), and children (HtmlNode | str text chunks) in document
    order."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "HtmlNode | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []
        self.parent = parent

    def __repr__(self) -> str:  # debugging aid only
        return f"<{self.tag} {self.attrs!r} kids={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = HtmlNode("#root", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        amap: dict[str, str] = {}
        for k, v in attrs:
            k = k.lower()
            if k not in amap:
                amap[k] = v if v is not None else ""
        node = HtmlNode(tag.lower(), amap, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag.lower() not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        # <img ... /> — explicit self-close: element, never pushed
        amap: dict[str, str] = {}
        for k, v in attrs:
            k = k.lower()
            if k not in amap:
                amap[k] = v if v is not None else ""
        self.stack[-1].children.append(HtmlNode(tag.lower(), amap, self.stack[-1]))

    def handle_endtag(self, tag):
        tag = tag.lower()
        # pop to the nearest matching open element; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> HtmlNode:
    """Parse (possibly malformed) HTML into an element tree; returns
    the synthetic ``#root`` node."""
    b = _TreeBuilder()
    b.feed(text)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# selector compile + match
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*|\*)
  | \#(?P<id>[\w-]+)
  | \.(?P<cls>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:=(?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
  | :(?P<pseudo>[\w-]+)(?:\((?P<parg>[0-9]+)\))?
    """,
    re.X,
)

# pseudo-classes decidable at element start (the oracle's single-pass
# SAX matcher cannot see future siblings, so :last-child & friends are
# rejected at compile time — in BOTH engines, keeping the grammar
# identical). These cover 144 of the 145 distinct selectors the
# reference sample rules use.
_SUPPORTED_PSEUDOS = {"nth-child", "first-child"}


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs", "pseudos")

    def __init__(self, tag, id_, classes, attrs, pseudos=()):
        self.tag = tag  # None = any
        self.id = id_
        self.classes = classes  # list[str]
        self.attrs = attrs  # list[(name, value|None)]
        self.pseudos = pseudos  # list[(name, int-arg|None)]

    def matches(self, node: HtmlNode) -> bool:
        if node.tag.startswith("#"):
            return False
        if self.tag is not None and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = (node.attrs.get("class") or "").split()
            if any(c not in have for c in self.classes):
                return False
        for name, val in self.attrs:
            if name not in node.attrs:
                return False
            if val is not None and node.attrs.get(name) != val:
                return False
        for name, arg in self.pseudos:
            # 1-based position among ELEMENT siblings (CSS nth-child)
            if node.parent is None:
                return False
            sibs = [
                c for c in node.parent.children if isinstance(c, HtmlNode)
            ]
            pos = sibs.index(node) + 1
            if name == "nth-child" and pos != arg:
                return False
            if name == "first-child" and pos != 1:
                return False
        return True


def _compile_compound(tok: str) -> _Simple:
    tag = None
    id_ = None
    classes: list[str] = []
    attrs: list[tuple[str, str | None]] = []
    pseudos: list[tuple[str, int | None]] = []
    pos = 0
    while pos < len(tok):
        m = _TOKEN_RE.match(tok, pos)
        if m is None:
            raise ValueError(f"unsupported selector syntax at {tok[pos:]!r}")
        if m.group("tag"):
            tag = m.group("tag").lower()
        elif m.group("id"):
            id_ = m.group("id")
        elif m.group("cls"):
            classes.append(m.group("cls"))
        elif m.group("attr"):
            # q participates iff an =value clause was present
            val = m.group("val") if m.group("q") is not None else None
            attrs.append((m.group("attr").lower(), val))
        elif m.group("pseudo"):
            name = m.group("pseudo").lower()
            if name not in _SUPPORTED_PSEUDOS:
                raise ValueError(f"unsupported pseudo-class :{name}")
            arg = m.group("parg")
            if name == "nth-child" and arg is None:
                raise ValueError(":nth-child requires an integer argument")
            pseudos.append((name, int(arg) if arg is not None else None))
        pos = m.end()
    return _Simple(tag, id_, classes, attrs, pseudos)


def _scan_selector(selector: str) -> list[list[str]]:
    """Character scanner: split a selector into comma-separated parts of
    compound/``>`` tokens, treating ``,``/``>``/whitespace as structure
    ONLY outside ``[...]`` brackets and quotes — ``[alt=a>b]`` or
    ``[title="x, y"]`` stay one compound token (a naive
    ``replace('>', ' > ')`` would misparse the attribute value as a
    child combinator)."""
    parts: list[list[str]] = [[]]
    buf: list[str] = []
    depth = 0
    quote: str | None = None

    def flush():
        if buf:
            parts[-1].append("".join(buf))
            del buf[:]

    for ch in selector:
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"" and depth > 0:  # quotes only quote inside [...]
            quote = ch
            buf.append(ch)
        elif ch == "[":
            depth += 1
            buf.append(ch)
        elif ch == "]":
            depth = max(0, depth - 1)
            buf.append(ch)
        elif depth == 0 and ch == ",":
            flush()
            parts.append([])
        elif depth == 0 and ch == ">":
            flush()
            parts[-1].append(">")
        elif depth == 0 and ch.isspace():
            flush()
        else:
            buf.append(ch)
    if quote is not None or depth != 0:
        raise ValueError(f"unbalanced quote/bracket in selector {selector!r}")
    flush()
    return parts


def compile_selector(selector: str) -> list[list[tuple[str, _Simple]]]:
    """``"a > b c, d"`` → list of chains; each chain is
    ``[(combinator, simple), ...]`` with combinator ``" "`` (descendant)
    or ``">"`` (child); the first step's combinator is descendant
    (goquery ``Find`` matches descendants of the context node)."""
    chains = []
    for toks in _scan_selector(selector):
        chain: list[tuple[str, _Simple]] = []
        comb = " "
        for t in toks:
            if t == ">":
                comb = ">"
                continue
            chain.append((comb, _compile_compound(t)))
            comb = " "
        if comb == ">":
            raise ValueError(f"dangling '>' in selector {selector!r}")
        if chain:
            chains.append(chain)
    if not chains:
        raise ValueError(f"empty selector {selector!r}")
    return chains


def _chain_matches(node: HtmlNode, chain, last: int) -> bool:
    """Right-to-left match of chain[:last+1] ending at `node`.

    Like cascadia (goquery's matcher): ancestor steps are unscoped —
    they may match elements ABOVE the Find context; only the final
    element is constrained to be a context descendant (by select()'s
    traversal)."""
    comb, simple = chain[last]
    if not simple.matches(node):
        return False
    if last == 0:
        return True
    if comb == ">":
        p = node.parent
        return p is not None and _chain_matches(p, chain, last - 1)
    anc = node.parent
    while anc is not None:
        if _chain_matches(anc, chain, last - 1):
            return True
        anc = anc.parent
    return False


def select(context: HtmlNode, compiled) -> list[HtmlNode]:
    """All strict descendants of `context` matching the compiled
    selector, in document order (goquery ``Find`` semantics). Accepts a
    selector string or the result of :func:`compile_selector`."""
    if isinstance(compiled, str):
        compiled = compile_selector(compiled)
    out: list[HtmlNode] = []
    stack = [iter(context.children)]
    while stack:
        try:
            child = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if isinstance(child, HtmlNode):
            if any(
                _chain_matches(child, chain, len(chain) - 1)
                for chain in compiled
            ):
                out.append(child)
            stack.append(iter(child.children))
    return out


def node_text(node: HtmlNode) -> str:
    """Concatenated text of all descendant text nodes, document order
    (goquery ``Text()``)."""
    parts: list[str] = []
    stack = [iter(node.children)]
    while stack:
        try:
            child = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if isinstance(child, str):
            parts.append(child)
        else:
            stack.append(iter(child.children))
    return "".join(parts)


def node_attr(node: HtmlNode, name: str) -> str | None:
    """Attribute value or None (goquery ``Attr()``)."""
    return node.attrs.get(name.lower())


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace('"', "&quot;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _start_tag(tag: str, attrs: dict[str, str]) -> str:
    a = "".join(f' {k}="{_esc_attr(v)}"' for k, v in attrs.items())
    return f"<{tag}{a}>"


def node_html(node: HtmlNode) -> str:
    """Inner HTML of `node` — goquery ``Html()`` (``property.go``,
    ``html.Render`` over the selection's first element's children).

    Canonical serialization (identical, by contract, to the oracle's
    single-pass SAX serializer): lowercase tag/attr names, attributes in
    first-occurrence document order with ``&<>"`` escaped values, text
    with ``&<>`` escaped, void elements as ``<img .../>``, every
    non-void element explicitly closed (unclosed tag-soup elements gain
    their implied close, exactly where the parser's stack popped them),
    comments/doctype dropped. Iterative — no recursion limit on
    adversarially deep documents."""
    parts: list[str] = []
    # (children-iterator, close-tag|None) — close emitted at exhaustion
    stack: list[tuple] = [(iter(node.children), None)]
    while stack:
        it, close = stack[-1]
        child = next(it, None)
        if child is None:
            if close is not None:
                parts.append(close)
            stack.pop()
            continue
        if isinstance(child, str):
            parts.append(_esc_text(child))
        elif child.tag in _VOID:
            a = "".join(
                f' {k}="{_esc_attr(v)}"' for k, v in child.attrs.items()
            )
            parts.append(f"<{child.tag}{a}/>")
        else:
            parts.append(_start_tag(child.tag, child.attrs))
            stack.append((iter(child.children), f"</{child.tag}>"))
    return "".join(parts)
