"""Multi-wave crawl driver (SURVEY.md §7 Step 4): the iterative loop
around ``plans/wave.py`` with snapshot checkpointing and per-wave metrics.

The feedback edge (frontier ← discovered links) makes the crawl an
iterative batch algorithm, not a single streaming query (SURVEY.md §2.6
G1): each wave is one deterministic DataFrame job; state (frontier, seen,
results, crawl order, metrics) commits atomically to the SnapshotStore
after every wave, and ``resume=True`` continues from CURRENT — replaying
an interrupted wave is safe because waves are deterministic functions of
the previous snapshot.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.snapshots import SnapshotStore
from .config import CrawlConfig
from .wave import WaveOutput, empty_seen, frontier_from_seeds, run_wave


@dataclass
class CrawlState:
    wave: int
    next_seq: int
    frontier: DataFrame
    seen: DataFrame
    seen_bloom: DataFrame | None = None
    metrics: list[dict] = field(default_factory=list)


def _bloom_from_store(spark, store, bloom, manifest):
    """Committed bloom blobs — but ONLY when the committed geometry
    (partitions, m_bits, k) matches the configured one. A geometry change
    would reinterpret the blobs with the wrong bit positions → false
    NEGATIVES → already-seen URLs re-crawled. On mismatch (or when the
    crawl ran bloom-less before) rebuild from the exact seen table."""
    committed = (manifest.get("extra") or {}).get("bloom_params")
    params = {"partitions": bloom.partitions, "m_bits": bloom.m_bits, "k": bloom.k}
    if committed == params:
        try:
            return store.read_table(spark, "seen_bloom")
        except FileNotFoundError:
            pass
    return bloom.add(bloom.empty(spark), store.read_table(spark, "seen"))


_METRICS_SCHEMA = (
    "wave int, candidates long, disallowed long, misses long, "
    "ineligible long, selected long, deferred long, extracted long, "
    "extract_failures long, discovered long, fetched_bytes long"
)


def metrics_table(spark: SparkSession, metrics: list[dict]) -> DataFrame:
    """Per-wave metrics dicts → a queryable DataFrame (S7: the metrics
    'endpoint' as a snapshot table, not just manifest JSON — the Spark
    analog of the reference's Prometheus counters,
    rust/src/tracing_and_metrics.rs:5-20)."""
    cols = [c.split()[0] for c in _METRICS_SCHEMA.split(", ")]
    rows = [tuple(m.get(c) for c in cols) for m in metrics]
    return spark.createDataFrame(rows, _METRICS_SCHEMA)


def metrics_prometheus_text(metrics: list[dict], prefix: str = "crawl") -> str:
    """Prometheus text exposition of the per-wave counters — the Spark
    analog of the reference's scrape endpoints on :9000/:9001
    (rust/src/tracing_and_metrics.rs:5-20, prometheus/scrape_configs.yml:
    1-14; counter names mirror batcher_batches / worker_batches /
    downloaded_bytes, python/batcher.py:20, rust/src/commoncrawl.rs:9-15).
    Cumulative totals as counters plus per-wave gauge samples labeled by
    wave; serve it from any HTTP handler or dump it per snapshot."""
    lines: list[str] = []
    cols = [
        c.split()[0] for c in _METRICS_SCHEMA.split(", ")
        if c.split()[0] != "wave"
    ]
    for c in cols:
        total_name = f"{prefix}_{c}_total"
        lines.append(f"# TYPE {total_name} counter")
        lines.append(
            f"{total_name} {sum(m.get(c) or 0 for m in metrics)}"
        )
        gauge_name = f"{prefix}_{c}"
        lines.append(f"# TYPE {gauge_name} gauge")
        for m in metrics:
            if m.get(c) is not None:
                lines.append(f'{gauge_name}{{wave="{m["wave"]}"}} {m[c]}')
    return "\n".join(lines) + "\n"


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    config: CrawlConfig = CrawlConfig(),
    store: SnapshotStore | None = None,
    resume: bool = False,
) -> CrawlState:
    """Run waves until the frontier drains or ``config.max_waves``.

    With a ``store``, every wave commits
    frontier/seen/crawl_order/results/metrics and truncates DataFrame
    lineage by reloading state from the committed parquet (essential: an
    unbounded union-chain of `seen` otherwise grows the plan every wave).

    PRECONDITION: ``pages`` must be unique per url (one capture per URL).
    The wave's broadcast index join would duplicate a candidate per extra
    capture, corrupting crawl order and the seen set. Real CDX indexes
    hold multiple captures per URL — dedupe at ingest (keep the latest
    warc_ts) rather than per wave: one shuffle once instead of every wave.
    ``config.validate_pages_unique`` checks this once at crawl start
    (column-pruned to url — the fat html column is never read).
    """
    if config.validate_pages_unique:
        from pyspark.sql import functions as F

        dup = (
            pages.groupBy("url").count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                "pages table has duplicate urls; dedupe at ingest "
                "(e.g. keep max warc_ts per url) before run_crawl"
            )
    bloom = None
    if config.use_bloom:
        from ..operators.seen import BloomSeen

        bloom = BloomSeen(
            partitions=config.bloom_partitions,
            m_bits=config.bloom_bits,
            k=config.bloom_k,
        )

    if resume and store is not None and store.current_snapshot() is not None:
        manifest = store.read_manifest()
        state = CrawlState(
            wave=manifest["extra"]["next_wave"],
            next_seq=manifest["extra"]["next_seq"],
            frontier=store.read_table(spark, "frontier"),
            seen=store.read_table(spark, "seen"),
            seen_bloom=(
                _bloom_from_store(spark, store, bloom, manifest)
                if bloom is not None
                else None
            ),
            metrics=manifest["extra"]["metrics"],
        )
    else:
        state = CrawlState(
            wave=0,
            next_seq=1,
            frontier=frontier_from_seeds(seeds),
            seen=empty_seen(spark),
            seen_bloom=bloom.empty(spark) if bloom is not None else None,
        )

    while state.wave < config.max_waves:
        # frontier-drained check doubles as the auto-join-strategy input:
        # in "auto" mode count the (small, column-pruned) frontier so the
        # wave can pick broadcast vs shuffle_hash — still one action
        n_frontier = (
            state.frontier.count()
            if config.broadcast_frontier == "auto"
            else state.frontier.limit(1).count()
        )
        if n_frontier == 0:
            break
        out: WaveOutput = run_wave(
            spark,
            state.frontier,
            state.seen,
            pages,
            robots,
            wave=state.wave,
            config=config,
            next_seq=state.next_seq,
            seen_bloom=state.seen_bloom,
            bloom=bloom,
            frontier_count=n_frontier,
        )
        state.metrics.append(out.metrics)
        next_seq = state.next_seq + out.metrics["selected"]
        new_bloom = (
            bloom.add(state.seen_bloom, out.processed)
            if bloom is not None
            else None
        )

        if store is not None:
            tables = {
                "frontier": out.new_frontier,
                # S7: metrics as a queryable snapshot table, not only
                # manifest JSON
                "metrics": metrics_table(spark, state.metrics),
            }
            if new_bloom is not None:
                tables["seen_bloom"] = new_bloom
            # seen/crawl_order/results grow monotonically: commit only
            # this wave's delta (Iceberg-append semantics) — a cumulative
            # rewrite would cost O(total²) I/O over a long crawl. seen's
            # delta is exactly `processed` (wave step 8: new_seen = seen
            # ∪ processed, disjoint by construction).
            append_tables = {
                "seen": out.processed,
                "crawl_order": out.crawl_order,
                "results": out.results,
            }
            extra = {
                "next_wave": state.wave + 1,
                "next_seq": next_seq,
                "metrics": state.metrics,
            }
            if bloom is not None:
                # record the bloom geometry so resume can detect mismatch
                extra["bloom_params"] = {
                    "partitions": bloom.partitions,
                    "m_bits": bloom.m_bits,
                    "k": bloom.k,
                }
            store.commit(
                snapshot=state.wave + 1,
                tables=tables,
                extra=extra,
                append_tables=append_tables,
            )
            # lineage truncation: reload committed state
            state.frontier = store.read_table(spark, "frontier")
            state.seen = store.read_table(spark, "seen")
            if new_bloom is not None:
                state.seen_bloom = store.read_table(spark, "seen_bloom")
        else:
            # no store → truncate lineage in memory: without this the plan
            # tree compounds every wave and the driver dies generating
            # explain strings long before the data is big. frontier and
            # seen checkpoint as ONE tagged union (one job per wave, not
            # two — both recompute the same persisted wave intermediates).
            from pyspark.sql import functions as F

            tagged = out.new_frontier.withColumn("__t", F.lit("f")).unionByName(
                out.new_seen.withColumn("__t", F.lit("s")),
                allowMissingColumns=True,
            ).localCheckpoint(eager=True)
            state.frontier = tagged.filter(F.col("__t") == "f").select(
                "canon_url", "host", "surt", "priority"
            )
            state.seen = tagged.filter(F.col("__t") == "s").select("canon_url")
            if new_bloom is not None:
                state.seen_bloom = new_bloom.localCheckpoint(eager=True)
        # state is committed/checkpointed — release the wave's caches so a
        # long crawl doesn't accumulate dead blocks in executor storage
        for cached_df in out.cached:
            cached_df.unpersist()
        state.wave += 1
        state.next_seq = next_seq
    return state


def collect_outputs(
    spark: SparkSession, store: SnapshotStore
) -> tuple[list, list, set]:
    """(crawl_order rows, result rows, seen set) from the CURRENT snapshot
    — shaped for direct comparison against the oracle."""
    order = [
        r.asDict()
        for r in store.read_table(spark, "crawl_order").orderBy("seq").collect()
    ]
    results = [
        r.asDict()
        for r in store.read_table(spark, "results").orderBy("canon_url").collect()
    ]
    seen = {
        r["canon_url"] for r in store.read_table(spark, "seen").collect()
    }
    return order, results, seen
