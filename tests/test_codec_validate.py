import numpy as np
from pyspark.sql import functions as F

from spark_frontier.payload.codec import (
    decode_image,
    encode_image,
    phash64,
    psnr,
    synth_pixels,
)
from spark_frontier.payload.validate import PSNR_MIN_DB, validate_images
from spark_frontier.pipeline.synth import gen_images


def test_png_lossless_roundtrip():
    px = synth_pixels(7, 32, 24)
    assert np.array_equal(decode_image(encode_image(px, "png")), px)


def test_lossy_psnr_above_40():
    px = synth_pixels(7, 32, 24)
    dec = decode_image(encode_image(px, "jpeg"))
    p = psnr(px, dec)
    assert PSNR_MIN_DB < p < 60  # lossy: real error, above the invariant bar


def test_psnr_identical_inf():
    px = synth_pixels(1, 8, 8)
    assert psnr(px, px) == float("inf")


def test_phash_stable_across_lossy_encode():
    px = synth_pixels(3, 32, 24)
    dec = decode_image(encode_image(px, "webp"))
    assert phash64(px) == phash64(dec)  # perceptual hash survives quantization


def test_validate_images_spark(spark):
    pdf = gen_images(12)
    # corrupt one payload, wrong caption on another
    pdf.loc[3, "bytes"] = b"garbage"
    pdf.loc[5, "caption"] = "WRONG"
    df = spark.createDataFrame(pdf)
    out = df.withColumn(
        "v",
        validate_images(
            F.col("image_id"), F.col("bytes"), F.col("w"), F.col("h"),
            F.col("fmt"), F.col("caption"),
            F.lit(None).cast("string"),
        ),
    ).select("image_id", "fmt", "v.*").collect()
    by_id = {r["image_id"]: r for r in out}
    assert by_id["img-3"]["is_valid"] is False
    assert "decode failed" in by_id["img-3"]["reason"]
    # img-5 has a caption that doesn't match its reference caption — but we
    # passed ref_caption=None here so it's judged only on pixels
    ok = [r for r in out if r["image_id"] not in ("img-3",)]
    assert all(r["is_valid"] for r in ok)
    # lossy rows carry a real PSNR ≥ 40
    lossy = [r for r in ok if r["fmt"] in ("jpeg", "webp")]
    assert lossy and all(r["psnr_db"] >= 40 for r in lossy)


def test_validate_caption_equality(spark):
    pdf = gen_images(4)
    df = spark.createDataFrame(pdf)
    out = df.withColumn(
        "v",
        validate_images(
            F.col("image_id"), F.col("bytes"), F.col("w"), F.col("h"),
            F.col("fmt"),
            F.when(F.col("image_id") == "img-1", F.lit("tampered"))
            .otherwise(F.col("caption")),
            F.col("caption"),
        ),
    ).select("image_id", "v.is_valid", "v.reason").collect()
    by_id = {r["image_id"]: r for r in out}
    assert by_id["img-1"]["is_valid"] is False
    assert by_id["img-1"]["reason"] == "caption mismatch"
    assert by_id["img-0"]["is_valid"] is True


def test_attach_payload_strategies_agree(spark):
    """Size-aware payload join: broadcast / shuffle / auto produce the
    same rows (VERDICT r1: never force-broadcast a binary-payload table)."""
    from spark_frontier.fetch.fetcher import attach_payload
    from spark_frontier.pipeline.synth import gen_images

    images = spark.createDataFrame(gen_images(16))
    fetched = spark.createDataFrame(
        [(f"img-{i % 20}", 200 if i % 3 else 404, f"u{i}") for i in range(40)],
        "image_id string, http_code int, url string",
    )
    outs = {}
    for s in ("auto", "broadcast", "shuffle"):
        rows = attach_payload(fetched, images, strategy=s).select(
            "url", "image_id", "w", "h", "fmt", "ref_caption"
        ).collect()
        outs[s] = sorted((r["url"], r["w"], r["fmt"], r["ref_caption"])
                         for r in rows)
    assert outs["auto"] == outs["broadcast"] == outs["shuffle"]
    assert len(outs["auto"]) == 40


def test_image_quality_gate_discriminates(spark):
    """image_quality + quality_gate: noise images pass, smooth images
    fail the sharpness gate, tiny images fail the dims gate, and a
    corrupt blob is dropped to the validator's failure lane."""
    import numpy as np

    from spark_frontier.analytics.multimodal import (
        image_quality,
        laplacian_variance,
        quality_gate,
    )
    from spark_frontier.payload.codec import encode_image, synth_pixels

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    rows = [
        ("noise", encode_image(noise, "png")),
        ("smooth", encode_image(synth_pixels(1, 32, 24), "png")),
        ("tiny", encode_image(
            rng.integers(0, 256, (8, 8, 3)).astype(np.uint8), "png")),
        ("corrupt", b"not an image"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = quality_gate(
        image_quality(df), min_side=16, min_sharpness=5000.0,
        min_contrast=8.0,
    )
    got = {r["image_id"]: r.asDict() for r in out.collect()}

    assert "corrupt" not in got and len(got) == 3
    assert got["noise"]["is_ok"]
    assert got["noise"]["w"] == 32 and got["noise"]["h"] == 24
    assert not got["smooth"]["is_ok"]  # blur-gated
    assert got["smooth"]["sharpness"] < 5000.0 < got["noise"]["sharpness"]
    assert not got["tiny"]["is_ok"]  # dims-gated
    # UDF value matches the driver-side reference computation exactly
    assert got["noise"]["sharpness"] == laplacian_variance(noise)


def test_caption_alignment_properties(spark):
    """caption_alignment: scores bounded in [-1,1], empty captions score
    exactly 0, deterministic across runs, and gate honors the
    threshold."""
    from spark_frontier.analytics.multimodal import caption_alignment
    from spark_frontier.payload.codec import encode_image, synth_pixels

    rows = [
        ("a", encode_image(synth_pixels(1, 32, 24), "png"),
         "A fast striker photo"),
        ("b", encode_image(synth_pixels(2, 32, 24), "png"), "   "),
        ("c", encode_image(synth_pixels(3, 32, 24), "png"),
         "quiet stadium record"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, caption string"
    )
    out1 = {r["image_id"]: r.asDict()
            for r in caption_alignment(df, threshold=-2.0).collect()}
    out2 = {r["image_id"]: r.asDict()
            for r in caption_alignment(df, threshold=-2.0).collect()}
    assert out1 == out2  # deterministic
    assert all(-1.0 <= v["alignment"] <= 1.0 for v in out1.values())
    assert out1["b"]["alignment"] == 0.0  # tokenless caption
    assert all(v["is_aligned"] for v in out1.values())  # threshold -2
    gated = {r["image_id"]: r["is_aligned"]
             for r in caption_alignment(df, threshold=2.0).collect()}
    assert not any(gated.values())
