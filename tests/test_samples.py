"""The samples/ spiders are real runnable user code (the porting guide
for reference rule authors) — run the gallery sample end-to-end."""

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
