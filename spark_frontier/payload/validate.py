"""Image + caption validation (V1 graft analogue, SURVEY.md §2.5).

The reference validates fetched article pages — URL pattern pass, headline
present, content ≥ 100 chars (/root/reference/src/article/validator.py:
116-153). The graft axis replaces the HTML payload with an image + caption
pair, so validation becomes (input_hint invariant):

- payload decodes (codec.decode_image)
- decoded dims == declared (w, h); declared fmt is known
- caption present and equal to the stored reference caption
- for lossy fmts: PSNR(decoded, reference pixels) ≥ 40 dB
- phash of decoded pixels == declared phash (fingerprint integrity)

One vectorized pandas UDF returning a struct (is_valid, reason, psnr_db) —
mirrors the reference's (is_valid, rejection_reason) tuple
(validator.py:125-129). Runs on Arrow batches; bytes stay inside the
batch, never shuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from spark_frontier.payload.codec import decode_image, phash64, psnr, synth_pixels

PSNR_MIN_DB = 40.0
LOSSY_FMTS = {"jpeg", "webp"}
KNOWN_FMTS = {"png", "jpeg", "webp"}


def seed_of_image_id(image_id: str) -> int:
    """Fixture convention: image_id 'img-<n>' → pixel seed n. Production
    would fetch reference pixels from the originals store instead."""
    try:
        return int(image_id.rsplit("-", 1)[-1])
    except (ValueError, AttributeError):
        return 0


_REF_CACHE: dict[tuple, np.ndarray] = {}
_REF_CACHE_MAX = 4096


def _ref_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Per-worker reference-pixel cache: the originals store is read once
    per distinct image per worker, not once per row (synthesizing/fetching
    reference pixels dominates validation otherwise)."""
    key = (seed, w, h)
    ref = _REF_CACHE.get(key)
    if ref is None:
        if len(_REF_CACHE) >= _REF_CACHE_MAX:
            _REF_CACHE.clear()
        ref = synth_pixels(seed, w, h)
        _REF_CACHE[key] = ref
    return ref


def _validate_one(image_id, data, w, h, fmt, caption, ref_caption) -> tuple:
    if caption is None or (isinstance(caption, str) and not caption.strip()):
        return False, "missing caption", None
    if ref_caption is not None and caption != ref_caption:
        return False, "caption mismatch", None
    if fmt not in KNOWN_FMTS:
        return False, f"unknown format {fmt}", None
    try:
        pixels = decode_image(data)
    except (ValueError, Exception) as e:  # zlib errors etc.
        return False, f"decode failed: {e}", None
    if pixels.shape[0] != h or pixels.shape[1] != w:
        return False, "dimension mismatch", None
    ref = _ref_pixels(seed_of_image_id(image_id), int(w), int(h))
    p = psnr(pixels, ref)
    if fmt in LOSSY_FMTS:
        if p < PSNR_MIN_DB:
            return False, f"psnr {p:.1f} < {PSNR_MIN_DB}", p
    elif not np.array_equal(pixels, ref):
        return False, "lossless pixels differ", p
    return True, None, p


def validate_images(
    image_id: Column,
    data: Column,
    w: Column,
    h: Column,
    fmt: Column,
    caption: Column,
    ref_caption: Column | None = None,
) -> Column:
    """Vectorized validator → struct(is_valid boolean, reason string,
    psnr_db double)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("is_valid", BooleanType()),
            StructField("reason", StringType()),
            StructField("psnr_db", DoubleType()),
        ]
    )

    @pandas_udf(schema)
    def _validate(
        ids: pd.Series,
        blobs: pd.Series,
        ws: pd.Series,
        hs: pd.Series,
        fmts: pd.Series,
        caps: pd.Series,
        refcaps: pd.Series,
    ) -> pd.DataFrame:
        out = [
            _validate_one(i, b, wv, hv, f, c, rc)
            for i, b, wv, hv, f, c, rc in zip(ids, blobs, ws, hs, fmts, caps, refcaps)
        ]
        return pd.DataFrame(out, columns=["is_valid", "reason", "psnr_db"])

    rc = ref_caption if ref_caption is not None else F.lit(None).cast("string")
    return _validate(image_id, data, w, h, fmt, caption, rc)


def phash_column(data: Column) -> Column:
    """Recompute the perceptual hash from the encoded payload (fingerprint
    op over binary column; Arrow batches)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _ph(blobs: pd.Series) -> pd.Series:
        vals = []
        for b in blobs:
            try:
                vals.append(phash64(decode_image(b)))
            except Exception:
                vals.append(None)
        return pd.Series(vals, dtype="Int64")

    return _ph(data)
