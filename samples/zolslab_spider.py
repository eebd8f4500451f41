"""Sample spider: the reference zolslab rule
(`sample/static_rules/zolslab/zolslab.go`) — the zol forum rule at the
tablet board. zolslab.go is byte-identical to zolpc.go except the
spider name, the list path ``/padbbs/p{N}.html#c`` and the Aid loop
bound 1..640 (zolslab.go:36,43,52); see samples/zolpc_spider.py for
the shared rule's full mapping.

Run: ``python samples/zolslab_spider.py /tmp/zolslab-run``
"""

from __future__ import annotations

import sys

from zolpc_spider import VARIANTS, build_corpus, make_spider, page_url, run as _run

NAME = "中关村平板"
ZOLSLAB_SPIDER = make_spider(NAME)


def run(workdir: str, spark=None):
    return _run(workdir, spark=spark, name=NAME)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zolslab-run")
