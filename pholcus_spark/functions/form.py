"""HTML form serializer/submitter — how reference rules do logins and
searches (`app/spider/common/form.go:25-180`), previously a declared
gap; built on the same css.py selector engine as ``kind="css"`` rules.

Semantics mirrored from the reference:

* ``serializeForm`` (form.go:145-169): fields = every
  ``input,button,textarea`` descendant WITH a ``name`` attr and (a
  ``type`` attr or being a textarea); ``type="submit"`` entries are
  buttons, everything else contributes ``(name, value-or-"")``.
* ``formAttributes`` (form.go:171-180): method attr (default GET,
  uppercased), action attr (default: the page URL) absolutized against
  the page.
* ``Input/Inputs`` (form.go:60-75): only EXISTING field names are set.
* ``submit`` (form.go:104-140): clicks the first button if any (its
  name/value joins the payload); GET → ``action?querystring``; POST
  with ``enctype="multipart/form-data"`` → method ``POST-M``; POST
  otherwise — exactly the request shapes `LinkRule`/the fetchers
  already speak (httpfetch.encode_post handles the encodings).

Driver/rule-author surface, pure Python (runs fine inside pandas-UDF
kernels too — css.py has no Spark imports).
"""

from __future__ import annotations

import dataclasses
from urllib.parse import urlencode, urlsplit, urlunsplit

from ..css import HtmlNode, node_attr, node_text, parse_html, select
from ..keys import absolutize

__all__ = ["HtmlForm", "parse_forms"]


@dataclasses.dataclass
class HtmlForm:
    action: str  # absolute
    method: str  # GET / POST
    enctype: str
    fields: list[tuple[str, str]]  # document order, repeats allowed
    buttons: list[tuple[str, str]]  # type=submit entries

    def input(self, name: str, value: str) -> "HtmlForm":
        """Set an EXISTING field (form.go:60-66 — unknown names are
        ignored, like the reference)."""
        self.fields = [
            (n, value if n == name else v) for n, v in self.fields
        ]
        return self

    def inputs(self, kv: dict[str, str]) -> "HtmlForm":
        for k, v in kv.items():
            self.input(k, v)
        return self

    def submit(self, button: str | None = None) -> dict:
        """The request dict the reference's ctx.AddQueue would receive:
        ``{"url", "method", "post_data"}`` — feed it to ``engine.seed``
        entries or a fetch wave. Clicks the named button, else the
        first one, else submits buttonless (form.go:78-99)."""
        values = list(self.fields)
        if button is not None:
            match = [b for b in self.buttons if b[0] == button]
            if match:
                values.append(match[0])
        elif self.buttons:
            values.append(self.buttons[0])
        qs = urlencode(values)
        if self.method == "GET":
            # the serialized payload REPLACES any query already on the
            # action (form.go:116-124 sets URL.RawQuery) — naive
            # "action?qs" would yield /s?x=1?q=a on action="/s?x=1"
            parts = urlsplit(self.action)
            return {
                "url": urlunsplit(parts._replace(query=qs)),
                "method": "GET",
                "post_data": "",
            }
        method = "POST-M" if self.enctype == "multipart/form-data" else self.method
        return {"url": self.action, "method": method, "post_data": qs}


def _serialize(form: HtmlNode) -> tuple[list, list]:
    fields: list[tuple[str, str]] = []
    buttons: list[tuple[str, str]] = []
    for el in select(form, "input, button, textarea"):
        name = node_attr(el, "name")
        if name is None:
            continue
        typ = node_attr(el, "type")
        if typ is None and el.tag != "textarea":
            continue  # form.go:157: type attr required unless textarea
        if (typ or "") == "submit":
            buttons.append((name, node_attr(el, "value") or ""))
        elif el.tag == "textarea":
            fields.append((name, node_text(el)))
        else:
            fields.append((name, node_attr(el, "value") or ""))
    return fields, buttons


def parse_forms(html: str, page_url: str, selector: str = "form") -> list[HtmlForm]:
    """All forms matching `selector` on the page, serialized with the
    reference's rules; a form whose action cannot be absolutized is
    skipped (form.go:35-37 NewForm nil)."""
    root = parse_html(html)
    out: list[HtmlForm] = []
    for f in select(root, selector):
        action_attr = node_attr(f, "action")
        action = absolutize(page_url, action_attr if action_attr else page_url)
        if not action:
            continue
        fields, buttons = _serialize(f)
        out.append(
            HtmlForm(
                action=action,
                method=(node_attr(f, "method") or "GET").upper(),
                enctype=node_attr(f, "enctype") or "",
                fields=fields,
                buttons=buttons,
            )
        )
    return out
