"""Sharded cuckoo-filter URL-seen set: the deletable alternative to the
Bloom prefilter (north_rule says "Bloom/cuckoo"; operators/seen.py is the
Bloom half).

Why cuckoo: a recrawl/expiry policy needs to REMOVE entries from the seen
filter (the reference's seen map is mutable, store/store.go:22-42; Bloom
bits cannot be unset). A cuckoo filter stores displaceable fingerprints, so
``deleted()`` is exact: removing a previously-inserted key cannot disturb
other keys.

Same distribution shape as BloomSeenSet — drop-in for split_seen and the
engine's adaptive activation:
- JVM-side hashes (``xxhash64``), shard = pmod(h1, n_shards);
- probe/build/delete are shard-aligned Arrow cogroups (one task sees one
  shard's URLs + that shard's table; nothing broadcast; total filter size
  scales past any single executor);
- probes are fully vectorized numpy. Insert/delete kernels walk items in
  SORTED url_norm order inside the Arrow batch — cuckoo eviction is
  inherently sequential per shard, and the sort makes the table state
  deterministic across retries/resume (same inputs → bit-identical table).

Safety contract (same as Bloom): negatives are provably unseen, positives
fall through to the exact join. A shard that ever fails an insert (filter
over capacity after max kicks) sets ``overflowed`` and answers
maybe_seen=True for everything — degenerate but never incorrect.

Geometry: buckets of 4 16-bit fingerprints; n_buckets per shard must be a
power of two so the partial-key displacement ``i2 = i1 XOR g(fp)`` is an
involution under the index mask. fp = (h2 mod 65535) + 1 (never 0; 0 marks
an empty slot).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from brink_spark.operators.seen import _PROBE_SCHEMA, with_bloom_keys

BUCKET_SIZE = 4
MAX_KICKS = 500
_FP_MULT = 0x5BD5  # odd multiplier for the fingerprint->offset hash

CUCKOO_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("table", BinaryType()),
        StructField("n_buckets", LongType()),
        StructField("overflowed", BooleanType()),
    ]
)


def _fingerprints(h2: np.ndarray) -> np.ndarray:
    return ((h2.astype(np.uint64) % np.uint64(65535)) + np.uint64(1)).astype(
        np.int64
    )


def _alt_index(i: np.ndarray | int, fp: np.ndarray | int, mask: int):
    return (i ^ ((fp * _FP_MULT) & mask)) & mask


def _place(row: np.ndarray, fp: int) -> bool:
    free = np.nonzero(row == 0)[0]
    if len(free):
        row[free[0]] = fp
        return True
    return False


def _insert_one(table: np.ndarray, i1: int, fp: int, mask: int) -> bool:
    i2 = _alt_index(i1, fp, mask)
    if _place(table[i1], fp) or _place(table[i2], fp):
        return True
    i = i1
    for k in range(MAX_KICKS):  # deterministic eviction walk
        slot = k % BUCKET_SIZE
        victim = int(table[i][slot])
        table[i][slot] = fp
        fp = victim
        i = _alt_index(i, fp, mask)
        if _place(table[i], fp):
            return True
    return False


def _delete_one(table: np.ndarray, i1: int, fp: int, mask: int) -> bool:
    for i in (i1, _alt_index(i1, fp, mask)):
        hit = np.nonzero(table[i] == fp)[0]
        if len(hit):
            table[i][hit[0]] = 0
            return True
    return False


class CuckooSeenSet:
    """Shard-partitioned cuckoo filter over normalized URLs. Same probe /
    empty / updated surface as BloomSeenSet (drop-in for split_seen and the
    engine's adaptive activation), plus ``deleted`` for entry expiry."""

    def __init__(self, n_shards: int, n_buckets: int):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_shards = n_shards
        self.n_buckets = n_buckets

    def empty(self, spark) -> DataFrame:
        return spark.createDataFrame([], schema=CUCKOO_SCHEMA)

    def _load(self, right: pd.DataFrame) -> tuple[np.ndarray, bool]:
        tab = (
            np.frombuffer(right["table"].iloc[0], dtype=np.uint16)
            .reshape(-1, BUCKET_SIZE)
            .astype(np.int64)
        )
        return tab, bool(right["overflowed"].iloc[0])

    # -- probe (vectorized) ---------------------------------------------------
    def probe(self, urls: DataFrame, shards: DataFrame) -> DataFrame:
        mask = self.n_buckets - 1

        def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if left.empty:
                return pd.DataFrame(columns=["url_norm", "maybe_seen"])
            if right.empty:
                return pd.DataFrame(
                    {"url_norm": left["url_norm"], "maybe_seen": False}
                )
            tab, overflowed = self._load(right)
            if overflowed:
                return pd.DataFrame(
                    {"url_norm": left["url_norm"], "maybe_seen": True}
                )
            i1 = (left["_h1"].to_numpy().astype(np.uint64) & np.uint64(mask)).astype(
                np.int64
            )
            fp = _fingerprints(left["_h2"].to_numpy())
            i2 = _alt_index(i1, fp, mask)
            found = (tab[i1] == fp[:, None]).any(axis=1) | (
                tab[i2] == fp[:, None]
            ).any(axis=1)
            return pd.DataFrame({"url_norm": left["url_norm"], "maybe_seen": found})

        keyed = with_bloom_keys(
            urls.select("url_norm").distinct(), "url_norm", self.n_shards
        )
        return (
            keyed.groupBy("_shard")
            .cogroup(shards.groupBy("shard"))
            .applyInPandas(_probe, schema=_PROBE_SCHEMA)
        )

    # -- build / merge / delete ------------------------------------------------
    def _mutate(self, urls: DataFrame, shards: DataFrame, delete: bool) -> DataFrame:
        n_buckets = self.n_buckets
        mask = n_buckets - 1

        def _apply(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if right.empty and left.empty:
                return pd.DataFrame(
                    columns=["shard", "table", "n_buckets", "overflowed"]
                )
            if right.empty:
                shard = int(left["_shard"].iloc[0])
                tab = np.zeros((n_buckets, BUCKET_SIZE), dtype=np.int64)
                overflowed = False
            else:
                shard = int(right["shard"].iloc[0])
                tab, overflowed = self._load(right)
                tab = tab.copy()
            if not left.empty:
                order = np.argsort(left["url_norm"].to_numpy())  # determinism
                i1s = (
                    left["_h1"].to_numpy().astype(np.uint64) & np.uint64(mask)
                ).astype(np.int64)[order]
                fps = _fingerprints(left["_h2"].to_numpy())[order]
                for i1, fp in zip(i1s, fps):
                    if delete:
                        _delete_one(tab, int(i1), int(fp), mask)
                    elif not overflowed and not _insert_one(
                        tab, int(i1), int(fp), mask
                    ):
                        overflowed = True  # shard answers True-for-all now
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "table": [tab.astype(np.uint16).tobytes()],
                    "n_buckets": [n_buckets],
                    "overflowed": [overflowed],
                }
            )

        keyed = with_bloom_keys(
            urls.select("url_norm").distinct(), "url_norm", self.n_shards
        )
        return (
            keyed.groupBy("_shard")
            .cogroup(shards.groupBy("shard"))
            .applyInPandas(_apply, schema=CUCKOO_SCHEMA)
        )

    def updated(self, new_urls: DataFrame, shards: DataFrame) -> DataFrame:
        return self._mutate(new_urls, shards, delete=False)

    def deleted(self, urls: DataFrame, shards: DataFrame) -> DataFrame:
        """Remove previously-inserted urls (visited-entry expiry for
        recrawl). Exact: other keys' fingerprints are untouched."""
        return self._mutate(urls, shards, delete=True)
