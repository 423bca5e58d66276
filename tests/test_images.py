"""Thumbnail candidate selection (Images.cpp:118-230)."""

import pytest


@pytest.fixture()
def media(spark):
    rows = [
        (1, "s1", "http://a.example.com/banner_top.jpg", 0, None, None),
        (1, "s1", "http://a.example.com/icon.jpg", 1, 32, 32),
        (1, "s1", "http://a.example.com/photos/story1.jpg", 2, 640, 480),
        (2, "s1", "http://a.example.com/decor.jpg", 0, None, None),
        (2, "s1", "http://a.example.com/photos/story2.jpg", 1, None, None),
        (3, "s1", "http://a.example.com/decor.jpg", 0, None, None),
        (3, "s1", "http://a.example.com/photos/story3.jpg", 1, None, None),
        (4, "s2", "http://a.example.com/decor.jpg", 0, None, None),
        (4, "s2", "http://localhost/x.jpg", 1, None, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, site string, img_url string, img_order int, "
              "width int, height int")


def test_filters_and_site_vote(spark, media):
    from open_source_search_engine_spark.functions.images import (
        image_candidates, select_thumbnails)
    c = image_candidates(media)
    urls = {r["img_url"] for r in c.collect()}
    assert "http://a.example.com/banner_top.jpg" not in urls  # blacklist
    assert "http://a.example.com/icon.jpg" not in urls        # too small
    assert "http://localhost/x.jpg" not in urls               # bad domain
    th = {r["doc_id"]: r["thumbnail"]
          for r in select_thumbnails(c).collect()}
    assert th[1] == "http://a.example.com/photos/story1.jpg"
    # decor.jpg reused on docs 2+3 of s1 -> template, photos win
    assert th[2] == "http://a.example.com/photos/story2.jpg"
    assert th[3] == "http://a.example.com/photos/story3.jpg"
    # s2 saw decor.jpg only once: it IS the thumbnail there
    assert th[4] == "http://a.example.com/decor.jpg"


def test_thumbnail_media_end_to_end(spark, media):
    """Select → payload join → real decode + pnmscale-style resize."""
    import numpy as np
    from open_source_search_engine_spark.functions.images import (
        image_candidates, select_thumbnails, thumbnail_media)
    from open_source_search_engine_spark.training.multimodal import (
        encode_ppm, fit_box)
    rng = np.random.default_rng(3)
    blobs = []
    for url, (w, h) in [
        ("http://a.example.com/photos/story1.jpg", (640, 480)),
        ("http://a.example.com/photos/story2.jpg", (300, 100)),
        ("http://a.example.com/photos/story3.jpg", (80, 60)),
        ("http://a.example.com/decor.jpg", (50, 400)),
        ("http://a.example.com/banner_top.jpg", (10, 10)),  # never selected
    ]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blobs.append((url, "image", bytearray(encode_ppm(px))))
    media_blobs = spark.createDataFrame(
        blobs, "media_url string, kind string, payload binary")
    sel = select_thumbnails(image_candidates(media))
    out = {r["doc_id"]: r
           for r in thumbnail_media(sel, media_blobs).collect()}
    assert set(out) == {1, 2, 3, 4}
    for doc, (w, h) in [(1, (640, 480)), (2, (300, 100)),
                        (3, (80, 60)), (4, (50, 400))]:
        ow, oh = fit_box(w, h, 160, 120)
        assert (out[doc]["out_width"], out[doc]["out_height"]) == (ow, oh)
        header = b"P6\n%d %d\n255\n" % (ow, oh)
        assert out[doc]["payload_out_bytes"] == len(header) + ow * oh * 3
    # duplicate payload rows (same media_url fetched twice) must not fan
    # out: still exactly one row per doc
    dup_blobs = media_blobs.union(media_blobs)
    rows = thumbnail_media(sel, dup_blobs).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3, 4]
