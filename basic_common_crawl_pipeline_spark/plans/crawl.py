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


def _bloom_from_store(spark, store, bloom):
    """Committed bloom blobs, or rebuild them from the exact seen table
    when resuming a crawl that ran without the bloom before."""
    try:
        return store.read_table(spark, "seen_bloom")
    except FileNotFoundError:
        return bloom.add(bloom.empty(spark), store.read_table(spark, "seen"))


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
    """
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
                _bloom_from_store(spark, store, bloom) if bloom is not None else None
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
        if state.frontier.limit(1).count() == 0:
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
        )
        state.metrics.append(out.metrics)
        next_seq = state.next_seq + out.metrics["selected"]
        new_bloom = (
            bloom.add(state.seen_bloom, out.processed)
            if bloom is not None
            else None
        )

        if store is not None:
            prev_order = (
                store.read_table(spark, "crawl_order")
                if state.wave > 0 and store.current_snapshot() is not None
                else None
            )
            prev_results = (
                store.read_table(spark, "results")
                if state.wave > 0 and store.current_snapshot() is not None
                else None
            )
            order_all = (
                prev_order.unionByName(out.crawl_order)
                if prev_order is not None
                else out.crawl_order
            )
            results_all = (
                prev_results.unionByName(out.results)
                if prev_results is not None
                else out.results
            )
            tables = {
                "frontier": out.new_frontier,
                "seen": out.new_seen,
                "crawl_order": order_all,
                "results": results_all,
            }
            if new_bloom is not None:
                tables["seen_bloom"] = new_bloom
            store.commit(
                snapshot=state.wave + 1,
                tables=tables,
                extra={
                    "next_wave": state.wave + 1,
                    "next_seq": next_seq,
                    "metrics": state.metrics,
                },
            )
            # lineage truncation: reload committed state
            state.frontier = store.read_table(spark, "frontier")
            state.seen = store.read_table(spark, "seen")
            if new_bloom is not None:
                state.seen_bloom = store.read_table(spark, "seen_bloom")
        else:
            # no store → truncate lineage in memory: without this the plan
            # tree compounds every wave and the driver dies generating
            # explain strings long before the data is big
            state.frontier = out.new_frontier.localCheckpoint(eager=True)
            state.seen = out.new_seen.localCheckpoint(eager=True)
            if new_bloom is not None:
                state.seen_bloom = new_bloom.localCheckpoint(eager=True)
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
