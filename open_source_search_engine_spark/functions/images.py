"""Thumbnail candidate selection (Images.cpp).

The reference picks each page's thumbnail from its <img> tags by pure
metadata — the rules mirrored here (Images.cpp:118-230):

* declared width/height < 50 rules out decorating images,
* the URL must carry a valid domain,
* skip-substring blacklist: logo, comment, print, subscribe, header,
  footer, menu, button, banner, ad.doubleclick., ads.webfeat.,
  xads.zedo. (Images.cpp:189-200),
* at most ``MAX_IMAGES`` candidates per page in document order,
* an image reused across pages of the same site is template decoration,
  not content — the reference checks a ``gbimage:<url>`` termlist for
  uniqueness against the site's template pages (Images.cpp:206-223,
  getThumbnail's gbsitetemplate count); here that's one vote aggregate,
* candidates are tried in document order and the first surviving one
  becomes the thumbnail; the download/scale step is the REAL decode +
  aspect-fit resample path in training/multimodal.py (``thumbnail_media``
  below composes the two, mirroring Images.cpp downloadImage →
  ``*topnm | pnmscale`` end-to-end).

Spark shape: filters are pure Catalyst; the site-uniqueness vote is one
(site, img_url) aggregate + an anti-join; first-per-page is a min_by —
no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_IMAGES = 10

# Images.cpp:189-200
SKIP_SUBSTRINGS = ("logo", "comment", "print", "subscribe", "header",
                   "footer", "menu", "button", "banner",
                   "ad.doubleclick.", "ads.webfeat.", "xads.zedo.")


def _passes_filters(url_col, width_col, height_col):
    ok = url_col.rlike(r"^https?://[^/]+\.[^/]+/")   # valid domain
    ok = ok & (width_col.isNull() | (width_col >= 50))
    ok = ok & (height_col.isNull() | (height_col >= 50))
    low = F.lower(url_col)
    for s in SKIP_SUBSTRINGS:
        ok = ok & ~low.contains(s)
    return ok


def image_candidates(media: DataFrame, doc_col: str = "doc_id",
                     site_col: str = "site", url_col: str = "img_url",
                     order_col: str = "img_order",
                     width_col: str = "width",
                     height_col: str = "height") -> DataFrame:
    """Filter media refs down to thumbnail candidates, keeping at most
    MAX_IMAGES per page in document order."""
    c = (media.filter(_passes_filters(F.col(url_col), F.col(width_col),
                                      F.col(height_col)))
         .select(F.col(doc_col).alias("doc_id"),
                 F.col(site_col).alias("site"),
                 F.col(url_col).alias("img_url"),
                 F.col(order_col).alias("img_order")))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("img_order", "img_url")
    return (c.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= MAX_IMAGES)
            .drop("_rk"))


def select_thumbnails(cands: DataFrame, min_site_reuse: int = 2
                      ) -> DataFrame:
    """Drop site-template images (same img_url on ``min_site_reuse``+
    pages of the site — the gbimage uniqueness check) and pick each
    page's FIRST surviving candidate."""
    reused = (cands.groupBy("site", "img_url")
              .agg(F.count_distinct("doc_id").alias("_n"))
              .filter(F.col("_n") >= min_site_reuse)
              .select("site", "img_url"))
    unique = cands.join(reused, ["site", "img_url"], "left_anti")
    return (unique.groupBy("doc_id")
            .agg(F.min_by(F.col("img_url"),
                          F.struct("img_order", "img_url"))
                 .alias("thumbnail")))


def thumbnail_media(selected: DataFrame, media: DataFrame,
                    box_w: int = 160, box_h: int = 120) -> DataFrame:
    """End-to-end Images.cpp: join each page's selected thumbnail URL to
    its fetched payload (the downloadImage step) and run the REAL decode →
    aspect-fit resample → PPM re-encode (the ``*topnm | pnmscale -xysize``
    step, Images.cpp:160-178).

    ``selected``: (doc_id, thumbnail) from :func:`select_thumbnails`.
    ``media``: (media_url, kind, payload) fetched image bytes.
    Returns (doc_id, thumbnail, out_width, out_height, payload_out_bytes).

    Spark shape: the selected side is one row per page (small next to the
    media blob table), so the join broadcasts selection onto the payloads
    and only matched blobs ever decode — the resize UDF never sees an
    unselected image."""
    from ..training.multimodal import resize_media
    # one payload per URL: the same media_url fetched twice (re-crawl, two
    # pages embedding it) must not fan out the join — each duplicate would
    # multiply through the matched x thumbs self-join below
    media_one = media.dropDuplicates(["media_url"])
    matched = (media_one.join(
        F.broadcast(selected.withColumnRenamed("thumbnail", "media_url")),
        "media_url")
        .select(F.col("doc_id").alias("media_id"), "kind", "payload",
                F.col("media_url").alias("thumbnail")))
    thumbs = resize_media(matched, box_w, box_h)
    return (matched.select("media_id", "thumbnail")
            .join(thumbs, "media_id")
            .select(F.col("media_id").alias("doc_id"), "thumbnail",
                    "out_width", "out_height", "payload_out_bytes"))
