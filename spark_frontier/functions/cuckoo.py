"""Segmented cuckoo filter over ``url_key`` — the DELETABLE seen-filter
alternative the north rule names ("bloom/cuckoo URL-seen filter").

Fan et al. 2014 ("Cuckoo Filter: Practically Better than Bloom"):
16-bit fingerprints in 4-slot buckets; a key lives in bucket
i1 = h(key) or i2 = i1 XOR h(fingerprint), so membership checks two
buckets and DELETION removes one matching fingerprint copy — the
operation a bloom filter cannot do. That is exactly the retention-TTL
pain point: the batch cycle's bloom must be REBUILT from the full links
table after a TTL delete (pipeline/crawl.py re-admission), while a
cuckoo filter just deletes the expired keys in place.

Safety contract (why dedup stays exact): the crawl topology treats the
filter as negative-pass-through — a positive only routes a row to the
exact anti-join, so false positives cost a probe, never correctness.
False NEGATIVES would leak duplicates, and a cuckoo filter has none as
long as every delete corresponds to one prior insert of that same key
(fingerprints are stored as a multiset: two colliding keys insert two
copies, deleting one leaves the other's). The engine inserts each
url_key exactly once (links are unique by key) and deletes only keys
read back from the links table, so the invariant holds by construction.

Layout mirrors ``functions.bloom``: keys partition to ``n_segments``
independent filters by pmod(key); each segment row is
(seg_id, n_buckets, table binary — uint16[n_buckets × 4]). Build and
mutate run as applyInPandas per segment (cogrouped for upsert/delete);
the probe is a broadcast pandas UDF, drop-in for ``dedup_unseen``'s
``probe_fn`` seam.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SLOTS = 4
MAX_KICKS = 500

SEG_SCHEMA = StructType([
    StructField("seg_id", IntegerType()),
    StructField("n_buckets", LongType()),
    StructField("table", BinaryType()),
])


def _mix(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    """splitmix64-style avalanche over uint64 (vectorized)."""
    z = (x + salt).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    f = (_mix(keys.astype(np.uint64), np.uint64(0x9E3779B97F4A7C15))
         & np.uint64(0xFFFF)).astype(np.uint16)
    f[f == 0] = 1  # 0 marks an empty slot
    return f


def _bucket1(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_mix(keys.astype(np.uint64), np.uint64(0xD6E8FEB86659FD93))
            & np.uint64(n_buckets - 1)).astype(np.int64)


def _alt_bucket(i: np.ndarray, f: np.ndarray, n_buckets: int) -> np.ndarray:
    h = _mix(f.astype(np.uint64), np.uint64(0xC2B2AE3D27D4EB4F))
    return (i.astype(np.uint64) ^ (h & np.uint64(n_buckets - 1))).astype(
        np.int64
    ) & (n_buckets - 1)


def _insert_all(table: np.ndarray, keys: np.ndarray) -> None:
    """Insert keys (python eviction loop — the offline build path).
    Deterministic: keys processed in sorted order, kicks cycle slots in
    order. Raises on a full filter (caller rebuilds with more
    headroom)."""
    n_buckets = table.shape[0]
    fs = _fingerprints(keys)
    i1s = _bucket1(keys, n_buckets)
    order = np.argsort(keys, kind="stable")
    for idx in order:
        f, i = np.uint16(fs[idx]), int(i1s[idx])
        placed = False
        alt = int(_alt_bucket(np.array([i]), np.array([f]), n_buckets)[0])
        for b in (i, alt):
            empty = np.flatnonzero(table[b] == 0)
            if len(empty):
                table[b][empty[0]] = f
                placed = True
                break
        if placed:
            continue
        # eviction chain from the alt bucket; the evicted SLOT rotates
        # with the kick counter — a fixed slot ping-pongs between two
        # full buckets forever (the classic deterministic-cuckoo trap),
        # rotation breaks the 2-cycle while staying reproducible
        cur = alt
        for kick in range(MAX_KICKS):
            slot = kick % SLOTS
            f, table[cur][slot] = np.uint16(table[cur][slot]), f
            cur = int(_alt_bucket(np.array([cur]), np.array([f]),
                                  n_buckets)[0])
            empty = np.flatnonzero(table[cur] == 0)
            if len(empty):
                table[cur][empty[0]] = f
                placed = True
                break
        if not placed:
            raise RuntimeError(
                "cuckoo filter full — rebuild with more headroom"
            )


def _delete_all(table: np.ndarray, keys: np.ndarray) -> int:
    """Remove ONE fingerprint copy per key from either candidate bucket.
    Returns how many keys were found (absent keys are ignored — deleting
    a never-inserted key is the one operation that could manufacture a
    false negative, so callers must only pass known-inserted keys)."""
    n_buckets = table.shape[0]
    fs = _fingerprints(keys)
    i1s = _bucket1(keys, n_buckets)
    i2s = _alt_bucket(i1s, fs, n_buckets)
    removed = 0
    for f, i1, i2 in zip(fs, i1s, i2s):
        for b in (int(i1), int(i2)):
            hit = np.flatnonzero(table[b] == f)
            if len(hit):
                table[b][hit[0]] = 0
                removed += 1
                break
    return removed


def _contains(table: np.ndarray, keys: np.ndarray) -> np.ndarray:
    n_buckets = table.shape[0]
    fs = _fingerprints(keys)
    i1s = _bucket1(keys, n_buckets)
    i2s = _alt_bucket(i1s, fs, n_buckets)
    return ((table[i1s] == fs[:, None]).any(axis=1)
            | (table[i2s] == fs[:, None]).any(axis=1))


def _size_buckets(n_keys: int, headroom: float) -> int:
    need = max(int(np.ceil(n_keys / (SLOTS * headroom))), 1)
    return 1 << int(np.ceil(np.log2(need)))


def build_cuckoo_segments(
    keys: DataFrame,
    n_segments: int = 16,
    key_col: str = "url_key",
    headroom: float = 0.7,
    n_buckets: int | None = None,
) -> DataFrame:
    """Distributed build: keys pmod-partition to segments; each segment's
    filter builds inside applyInPandas (bytes never reach the driver).
    ``n_buckets`` (per segment) overrides auto-sizing — pass it when
    pre-sizing for growth."""
    nb_fixed = n_buckets

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["_seg"].iloc[0])
        arr = pdf[key_col].to_numpy(dtype=np.int64)
        nb = nb_fixed or _size_buckets(len(arr), headroom)
        table = np.zeros((nb, SLOTS), dtype=np.uint16)
        _insert_all(table, arr)
        return pd.DataFrame(
            {"seg_id": [seg], "n_buckets": [nb],
             "table": [table.tobytes()]}
        )

    return (
        keys.select(key_col)
        .withColumn("_seg", F.pmod(F.col(key_col), F.lit(n_segments))
                    .cast("int"))
        .groupBy("_seg")
        .applyInPandas(_build, SEG_SCHEMA)
    )


def _mutate_segments(
    segments: DataFrame,
    keys: DataFrame,
    n_segments: int,
    key_col: str,
    op: str,
) -> DataFrame:
    """Cogroup (segment tables × keys) and apply insert/delete per
    segment — the incremental maintenance path (no rebuild)."""

    def _apply(seg_pdf: pd.DataFrame, key_pdf: pd.DataFrame) -> pd.DataFrame:
        if seg_pdf.empty:
            # keys for a segment with no table yet: build fresh (insert)
            # or nothing to delete from
            if op == "delete" or key_pdf.empty:
                return pd.DataFrame(columns=["seg_id", "n_buckets", "table"])
            arr = key_pdf[key_col].to_numpy(dtype=np.int64)
            nb = _size_buckets(len(arr), 0.7)
            table = np.zeros((nb, SLOTS), dtype=np.uint16)
            _insert_all(table, arr)
            return pd.DataFrame(
                {"seg_id": [int(key_pdf["_seg"].iloc[0])],
                 "n_buckets": [nb], "table": [table.tobytes()]}
            )
        nb = int(seg_pdf["n_buckets"].iloc[0])
        table = np.frombuffer(
            seg_pdf["table"].iloc[0], dtype=np.uint16
        ).reshape(nb, SLOTS).copy()
        if not key_pdf.empty:
            arr = key_pdf[key_col].to_numpy(dtype=np.int64)
            if op == "insert":
                _insert_all(table, arr)
            else:
                _delete_all(table, arr)
        return pd.DataFrame(
            {"seg_id": [int(seg_pdf["seg_id"].iloc[0])],
             "n_buckets": [nb], "table": [table.tobytes()]}
        )

    keyed = keys.select(key_col).withColumn(
        "_seg", F.pmod(F.col(key_col), F.lit(n_segments)).cast("int")
    )
    return (
        segments.groupBy("seg_id")
        .cogroup(keyed.groupBy("_seg"))
        .applyInPandas(_apply, SEG_SCHEMA)
    )


def insert_cuckoo_keys(segments, keys, n_segments=16, key_col="url_key"):
    return _mutate_segments(segments, keys, n_segments, key_col, "insert")


def delete_cuckoo_keys(segments, keys, n_segments=16, key_col="url_key"):
    """The bloom-rebuild killer: TTL-expired keys leave the filter in
    place; the next cycle re-admits their URLs with no full-table scan."""
    return _mutate_segments(segments, keys, n_segments, key_col, "delete")


def probe_distributed(
    frontier: DataFrame,
    segments: DataFrame,
    key_col: str = "url_key",
    n_segments: int = 16,
) -> DataFrame:
    """The 10^10-key cuckoo probe: NO driver collect, NO table broadcast.

    Mirrors ``bloom.probe_distributed``'s cogroup-on-seg_id topology for
    the cuckoo layout: the frontier repartitions on seg_id and each task
    probes its slice against exactly ONE segment's fingerprint table. At
    the design point (10^10 keys × ~2.5 B/key with headroom) the whole
    cuckoo table is tens of GB — the broadcast probe would ship all of it
    to every executor, this path ships each executor only the segments it
    owns. Returns frontier + ``_maybe_seen`` boolean.
    """
    from pyspark.sql.types import BooleanType as _B

    fr = frontier.withColumn(
        "_seg_id", F.pmod(F.col(key_col), F.lit(n_segments)).cast("int")
    )
    out_schema = StructType(
        fr.schema.fields + [StructField("_maybe_seen", _B())]
    )

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(_maybe_seen=pd.Series([], dtype=bool))
        if right.empty:
            # no table for this segment → nothing was ever inserted there
            return left.assign(_maybe_seen=False)
        keys = left[key_col].to_numpy(dtype=np.int64)
        hit = np.zeros(len(keys), dtype=bool)
        # one canonical row per segment; defensively OR across any
        # unmerged delta rows (possibly-seen-in-ANY keeps the
        # negative-pass-through contract: extra positives only cost an
        # exact probe, a missed positive would leak a duplicate)
        for j in range(len(right)):
            nb = int(right["n_buckets"].iloc[j])
            table = np.frombuffer(
                right["table"].iloc[j], dtype=np.uint16
            ).reshape(nb, SLOTS)
            hit |= _contains(table, keys)
        return left.assign(_maybe_seen=hit)

    flagged = (
        fr.groupBy("_seg_id")
        .cogroup(
            segments.withColumnRenamed("seg_id", "_seg_id").groupBy("_seg_id")
        )
        .applyInPandas(_probe, out_schema)
    )
    return flagged.drop("_seg_id")


def cuckoo_contains_udf(spark, segments: DataFrame, n_segments: int):
    """Broadcast probe: ``col(url_key) -> boolean`` (true = POSSIBLY
    seen) — drop-in for ``dedup_unseen(probe_fn=...)``."""
    seg_map = {
        int(r["seg_id"]): np.frombuffer(r["table"], dtype=np.uint16)
        .reshape(int(r["n_buckets"]), SLOTS)
        for r in segments.collect()
    }
    bc = spark.sparkContext.broadcast(seg_map)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def might_contain(keys: pd.Series) -> pd.Series:
        arr = keys.to_numpy(dtype=np.int64)
        segs = np.mod(np.mod(arr, n_segments) + n_segments, n_segments)
        out = np.zeros(len(arr), dtype=bool)
        m = bc.value
        for s in np.unique(segs):
            tbl = m.get(int(s))
            if tbl is None:
                continue  # absent segment → nothing inserted there
            mask = segs == s
            out[mask] = _contains(tbl, arr[mask])
        return pd.Series(out)

    return might_contain
