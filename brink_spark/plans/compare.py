"""Engine ↔ oracle equivalence checks (the four e2e assertions, SURVEY.md §5.2).

1. final URL-seen keyset equality (url_norm → status),
2. wave-discretized crawl-order equality (attempted fetches, ordered by
   (wave, priority, host, url_norm)),
3. handler-row multiset equality including ``cached`` flags,
4. span-sequence equality per fetched document (kind, text, media_ref,
   offset, target order).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession, functions as F

from brink_spark.oracle.oracle import CrawlResult
from brink_spark.plans.crawl import CrawlEngine


@dataclass
class Comparison:
    visited_match: bool = False
    order_match: bool = False
    handler_match: bool = False
    spans_match: bool = False
    detail: dict = field(default_factory=dict)

    @property
    def all_match(self) -> bool:
        return (
            self.visited_match
            and self.order_match
            and self.handler_match
            and self.spans_match
        )


def _read_all_waves(spark: SparkSession, engine: CrawlEngine, table: str, last_wave: int):
    paths = [
        engine.store.wave_dir(table, w)
        for w in range(last_wave + 1)
        if engine.store.has(table, w)
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def compare_engine_oracle(
    spark: SparkSession, engine: CrawlEngine, oracle: CrawlResult
) -> Comparison:
    cmp = Comparison()
    man = engine.store.read_manifest()
    last = man.last_wave

    # 1. visited keyset + statuses
    vis_df = engine.store.read_visited(spark, man)
    vis = (
        {r["url_norm"]: r["status"] for r in vis_df.collect()}
        if vis_df is not None
        else {}
    )
    cmp.visited_match = vis == oracle.visited
    cmp.detail["n_visited"] = (len(vis), len(oracle.visited))

    # 2. crawl order: fetch attempts sorted by the contract key
    flog = _read_all_waves(spark, engine, "fetchlog", last)
    eng_order = (
        [
            (r["wave"], r["url_norm"])
            for r in flog.filter(
                ~F.col("outcome").isin(
                    "robots_denied", "deferred", "host_capped", "template_capped"
                )
            )
            .orderBy("wave", "priority", "host", "url_norm")
            .collect()
        ]
        if flog is not None
        else []
    )
    cmp.order_match = eng_order == oracle.crawl_log
    cmp.detail["n_fetches"] = (len(eng_order), len(oracle.crawl_log))
    if not cmp.order_match:
        for i, (a, b) in enumerate(zip(eng_order, oracle.crawl_log)):
            if a != b:
                cmp.detail["first_order_diff"] = (i, a, b)
                break

    # 3. handler rows (multiset, canonical sort), n_spans as body fingerprint
    res_df = _read_all_waves(spark, engine, "results", last)
    eng_rows = []
    if res_df is not None:
        for r in res_df.select(
            "wave",
            "linked_from",
            "url_norm",
            "status",
            "cached",
            F.when(F.col("spans").isNull(), -1)
            .otherwise(F.size("spans"))
            .alias("n_spans"),
        ).collect():
            eng_rows.append(tuple(r))
    eng_rows.sort(key=lambda r: (r[0], r[2], r[4], r[1]))
    ora_rows = [tuple(r) for r in oracle.handler_rows]
    cmp.handler_match = eng_rows == ora_rows
    cmp.detail["n_handler_rows"] = (len(eng_rows), len(ora_rows))
    if not cmp.handler_match:
        for i, (a, b) in enumerate(zip(eng_rows, ora_rows)):
            if a != b:
                cmp.detail["first_handler_diff"] = (i, a, b)
                break

    # 4. span-sequence equality per fetched doc (input_hint invariant)
    spans_ok = True
    if res_df is not None:
        fetched_docs = res_df.filter(~F.col("cached")).select("url_norm", "spans")
        for r in fetched_docs.collect():
            want = [
                (s.kind, s.text, s.media_ref, s.offset, s.target)
                for s in oracle.spans_by_doc.get(r["url_norm"], [])
            ]
            got = [
                (s["kind"], s["text"], s["media_ref"], s["offset"], s["target"])
                for s in (r["spans"] or [])
            ]
            if want != got:
                spans_ok = False
                cmp.detail.setdefault("span_diffs", []).append(r["url_norm"])
    cmp.spans_match = spans_ok
    return cmp
