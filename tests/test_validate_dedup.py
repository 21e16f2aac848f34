"""Parity: the deduped per-image validation path (validate_fetched) is
value-identical to the old per-row attach_payload + validate_images
pipeline, across every branch of the kernel."""

import math

from pyspark.sql import functions as F

from spark_frontier.fetch.fetcher import attach_payload
from spark_frontier.payload.codec import encode_image, synth_pixels
from spark_frontier.payload.validate import validate_fetched, validate_images


def _images_rows():
    rows = []

    def add(i, fmt, px_seed=None, w=16, h=12, declared_w=None, declared_h=None,
            blob=None, caption=None):
        px = synth_pixels(px_seed if px_seed is not None else i, w, h)
        rows.append({
            "image_id": f"img-{i}",
            "bytes": blob if blob is not None else encode_image(px, fmt),
            "w": declared_w if declared_w is not None else w,
            "h": declared_h if declared_h is not None else h,
            "fmt": fmt,
            "caption": caption if caption is not None else f"cap {i}",
            "phash": 0,
        })

    add(0, "png")                      # valid lossless
    add(1, "jpeg")                     # valid lossy (psnr ~47)
    add(2, "webp")                     # valid lossy
    add(3, "png", blob=b"garbage")     # decode failed
    add(4, "jpeg", declared_w=99)      # dimension mismatch
    add(5, "gif")                      # unknown format
    add(6, "jpeg", px_seed=999)        # psnr fail (wrong pixels vs seed 6)
    add(7, "png", px_seed=999)         # lossless pixels differ
    return rows


def _fetched_rows():
    # (url, image_id, caption, http_code) covering every row-level branch
    return [
        ("u00", "img-0", "cap 0", 200),          # fully valid
        ("u01", "img-1", "cap 1", 200),          # valid lossy
        ("u02", "img-2", "cap 2", 200),          # valid lossy
        ("u03", "img-3", "cap 3", 200),          # decode failed
        ("u04", "img-4", "cap 4", 200),          # dim mismatch
        ("u05", "img-5", "cap 5", 200),          # unknown fmt
        ("u06", "img-6", "cap 6", 200),          # psnr fail
        ("u07", "img-7", "cap 7", 200),          # lossless differ
        ("u08", "img-0", "WRONG", 200),          # caption mismatch
        ("u09", "img-0", None, 200),             # caption missing (null)
        ("u10", "img-0", "", 200),               # caption missing (empty)
        ("u11", "img-0", "  \t ", 200),          # caption missing (ascii ws)
        ("u12", "img-0", "  ", 200),   # caption missing (unicode ws)
        ("u13", "img-0", "\x1c", 200),           # python-only ws char
        ("u14", "img-99", "cap x", 200),         # image missing from store
        ("u15", "img-0", "cap 0", 404),          # non-200, good caption
        ("u16", "img-0", None, 404),             # non-200, no caption
        ("u17", None, None, 0),                  # connection failure
        ("u18", None, "stray caption", 0),       # failure but caption present
        ("u19", "img-6", "WRONG", 200),          # mismatch beats psnr fail
        ("u20", "img-5", None, 200),             # missing beats unknown fmt
    ]


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


def test_validate_fetched_matches_per_row_kernel(spark):
    images = spark.createDataFrame(_images_rows())
    fetched = spark.createDataFrame(
        _fetched_rows(), "url string, image_id string, caption string, "
        "http_code int",
    )

    # OLD path: late payload join + per-row kernel
    wp = attach_payload(fetched, images)
    old = (
        wp.withColumn(
            "_v",
            validate_images(
                F.col("image_id"), F.col("bytes"), F.col("w"), F.col("h"),
                F.col("fmt"), F.col("caption"), F.col("ref_caption"),
            ),
        )
        .select(
            "url",
            F.col("_v")["is_valid"].alias("is_valid"),
            F.col("_v")["reason"].alias("invalid_reason"),
            F.col("_v")["psnr_db"].alias("psnr_db"),
        )
    )
    old_by_url = {r["url"]: r for r in old.collect()}

    # NEW path, both join strategies
    for bcast in (False, True):
        new = validate_fetched(fetched, images, broadcast_images=bcast)
        new_by_url = {r["url"]: r for r in new.collect()}
        assert set(new_by_url) == set(old_by_url)
        for url, o in old_by_url.items():
            n = new_by_url[url]
            assert (_norm(n["is_valid"]), _norm(n["invalid_reason"]),
                    _norm(n["psnr_db"])) == (
                _norm(o["is_valid"]), _norm(o["invalid_reason"]),
                _norm(o["psnr_db"])), (
                f"{url}: new={n} old={o['is_valid'], o['invalid_reason'], o['psnr_db']}"
            )

    # sanity: the fixture actually exercised every distinct reason
    reasons = {r["invalid_reason"] for r in old_by_url.values()}
    assert "missing caption" in reasons
    assert "caption mismatch" in reasons
    assert "unknown format gif" in reasons
    assert "unknown format None" in reasons
    assert "dimension mismatch" in reasons
    assert "lossless pixels differ" in reasons
    assert any(r and r.startswith("decode failed") for r in reasons)
    assert any(r and r.startswith("psnr ") for r in reasons)


def test_validate_fetched_schema_matches_old_pipeline(spark):
    """The wave's downstream contract: same column set/order as the old
    with_payload+validate+drop pipeline."""
    images = spark.createDataFrame(_images_rows())
    fetched = spark.createDataFrame(
        _fetched_rows(), "url string, image_id string, caption string, "
        "http_code int",
    )
    wp = attach_payload(fetched, images)
    old_cols = (
        wp.withColumn(
            "_v",
            validate_images(
                F.col("image_id"), F.col("bytes"), F.col("w"), F.col("h"),
                F.col("fmt"), F.col("caption"), F.col("ref_caption"),
            ),
        )
        .select(
            "*",
            F.col("_v")["is_valid"].alias("is_valid"),
            F.col("_v")["reason"].alias("invalid_reason"),
            F.col("_v")["psnr_db"].alias("psnr_db"),
        )
        .drop("_v", "bytes", "ref_caption", "phash", "w", "h", "fmt")
        .columns
    )
    new_cols = validate_fetched(fetched, images).columns
    assert new_cols == old_cols
