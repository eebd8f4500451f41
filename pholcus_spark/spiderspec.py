"""Declarative spider config — the Spark-side replacement for the
reference's rule tree (``app/spider/spider.go:48-58``).

Instead of arbitrary Go ``ParseFunc`` closures, a spider is declared as
data: URL-pattern → (rule name, priority) routing for emitted links
(this is what reference rules do imperatively at ``ctx.AddQueue``,
``app/spider/context.go:104-125``; priority assignment mirrors
``sample/static_rules/taobao/taobao.go:168,213`` where detail=1 over
list=0). Both the Spark engine and the pure-Python conformance oracle
consume this same config — the config is shared *data*; the two
implementations are independent.
"""

from __future__ import annotations

import dataclasses
import re


@dataclasses.dataclass(frozen=True)
class LinkRule:
    pattern: str  # substring matched against the absolutized URL path
    rule: str
    priority: int


@dataclasses.dataclass(frozen=True)
class SpiderSpec:
    name: str
    link_rules: tuple[LinkRule, ...] = (
        LinkRule("/p/", "list", 0),
        LinkRule("/d/", "detail", 1),
        LinkRule("/img/", "image", 2),
    )
    item_rules: tuple[str, ...] = ("detail",)  # rules that emit item rows
    image_rule: str = "image"  # the FileOutput-style rule
    reloadable_urls: frozenset[str] = frozenset()  # request.go:270-277 opt-out
    limit: int | None = None  # total enqueue cap (matrix.go:59-61,97)
    max_depth: int | None = None

    def route(self, url: str) -> tuple[str, int] | None:
        for lr in self.link_rules:
            if lr.pattern in url:
                return lr.rule, lr.priority
        return None


def parse_keyins(raw: str) -> list[str]:
    """Split a ``"<a><b>"``-style keyin string into unique tokens,
    preserving first-seen order (``common/util/util.go:407-431``).
    A string without angle brackets is a single token.
    """
    if not raw:
        return []
    toks = re.findall(r"<([^<>]*)>", raw)
    if not toks:
        toks = [raw]
    seen: list[str] = []
    for t in toks:
        if t and t not in seen:
            seen.append(t)
    return seen


def fanout_spider_name(name: str, keyin: str) -> str:
    """Spider-clone naming for keyin fan-out (``app/crawler/spiderqueue.go:56-90``;
    reference subnames the clone by its keyin)."""
    return f"{name}__{keyin}" if keyin else name


KEYIN_TOKEN = "%keyin%"


def apply_keyin(url: str, keyin: str) -> str:
    return url.replace(KEYIN_TOKEN, keyin) if keyin else url
