"""Sample spider: the reference zolphone rule
(`sample/static_rules/zolphone/zolphone.go`) — the zol forum rule at
the phone board. zolphone.go is byte-identical to zolpc.go except the
spider name, the list path ``/sjbbs/d544_p{N}.html#c`` and the Aid
loop bound 1..950 (zolphone.go:36,43,52); see samples/zolpc_spider.py
for the shared rule's full mapping.

Run: ``python samples/zolphone_spider.py /tmp/zolphone-run``
"""

from __future__ import annotations

import sys

from zolpc_spider import VARIANTS, build_corpus, make_spider, page_url, run as _run

NAME = "中关村手机"
ZOLPHONE_SPIDER = make_spider(NAME)


def run(workdir: str, spark=None):
    return _run(workdir, spark=spark, name=NAME)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zolphone-run")
