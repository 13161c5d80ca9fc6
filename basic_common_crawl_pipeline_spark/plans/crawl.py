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
    "extract_failures long, discovered long, fetched_bytes long, "
    "frontier_size long"
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
        # frontier_size is a level, not a cumulative counter — gauge only
        if c != "frontier_size":
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


class MetricsServer:
    """Live Prometheus scrape endpoint — the executable counterpart of
    the reference's metrics HTTP servers on :9000/:9001
    (rust/src/tracing_and_metrics.rs:5-20, scraped by
    prometheus/scrape_configs.yml:1-14). Serves
    ``metrics_prometheus_text`` of the most recent per-wave metrics at
    ``/metrics`` from a daemon thread; wire it to a crawl via
    ``run_crawl(..., progress=server.update)``. ``port=0`` binds an
    ephemeral port (see ``.port``)."""

    def __init__(
        self, port: int = 0, prefix: str = "crawl", host: str = "127.0.0.1"
    ) -> None:
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self._metrics: list[dict] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_error(404)
                    return
                body = metrics_prometheus_text(
                    list(outer._metrics), prefix=prefix
                ).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *_args):  # quiet
                pass

        # loopback by default: the endpoint is unauthenticated, so
        # exposing it on every interface is an explicit opt-in
        # (host="0.0.0.0") for real scrape configs, not the default
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def update(self, metrics: list[dict]) -> None:
        """Per-wave progress hook: swap in the crawl's metrics so far."""
        self._metrics = list(metrics)

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    config: CrawlConfig = CrawlConfig(),
    store: SnapshotStore | None = None,
    resume: bool = False,
    progress=None,
) -> CrawlState:
    """Run waves until the frontier drains or ``config.max_waves``.

    Per-wave driver latency is ONE blocking Spark action (the wave's
    combined metrics/offsets/frontier-size job inside ``run_wave``):

    - the frontier-drained check and the auto join-strategy input reuse
      the previous wave's ``frontier_size`` metric (a fresh ``count()``
      runs only once, for the first wave of a run);
    - snapshot commits run on a background thread, overlapped with the
      NEXT wave's computation; the barrier sits just before that wave's
      state is rebased onto the committed parquet. CURRENT still flips
      atomically after all of a snapshot's writes, so crash/resume
      semantics are unchanged (an interrupted wave replays
      deterministically from the last committed snapshot);
    - lineage truncation is free of extra executions: ``run_wave``
      persists frontier/processed inside its single action, then hands
      back ``localCheckpoint(eager=False)`` leaves wrapped around the
      hot caches — materializing them later is a zero-job block copy —
      and ``seen`` is rebased onto the committed parquet each wave.

    With ``resume=False`` the store directory must not already contain a
    crawl (a fresh run over an old CURRENT would splice the old run's
    append-table deltas into the new run's tables — refused instead).

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

    fresh_start = not (
        resume and store is not None and store.current_snapshot() is not None
    )
    if not fresh_start:
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
        if store is not None and store.current_snapshot() is not None:
            raise ValueError(
                "snapshot store already contains a crawl (CURRENT="
                f"{store.current_snapshot()}); pass resume=True to continue "
                "it, or point the fresh run at an empty directory — "
                "re-using the store would splice the old run's append "
                "deltas into the new run's seen/crawl_order/results"
            )
        # persist → count (ONE execution: the drained check fills the
        # cache) → checkpoint-from-cache. The previous shape — a bare
        # lazy checkpoint counted afterwards — materialized the leaf as
        # its own SQL execution before the count's, paying two rounds of
        # AQE boundaries for one canonicalization (the wave-loop leaves
        # get the identical treatment in run_wave). The cache retires
        # after wave 0's barrier, once the leaf's blocks exist.
        initial_frontier = frontier_from_seeds(seeds).persist()
        initial_count = initial_frontier.count()
        state = CrawlState(
            wave=0,
            next_seq=1,
            frontier=initial_frontier.localCheckpoint(eager=False),
            seen=empty_seen(spark),
            seen_bloom=bloom.empty(spark) if bloom is not None else None,
        )

    from concurrent.futures import ThreadPoolExecutor

    committer = ThreadPoolExecutor(max_workers=1) if store is not None else None
    pending = None        # in-flight commit of the previous wave
    retiring: tuple = ()  # its caches — unpersist only after its barrier
    committed_this_run = False
    frontier_count: int | None = None
    if fresh_start:
        # the drained-check count already ran (cache-filling pass above);
        # retire the initial frontier's cache after wave 0's barrier,
        # once its checkpoint leaf has block-copied from it
        frontier_count = initial_count
        retiring = (initial_frontier,)
    # the robots dim is re-read every wave (broadcast join build) — cache
    # it once per crawl instead of recomputing its lineage per wave
    robots = robots.persist()
    try:
        while state.wave < config.max_waves:
            if frontier_count is None:
                # first wave of this run only; every later wave reuses the
                # previous wave's frontier_size metric (drained check AND
                # auto-join-strategy input, zero extra actions)
                frontier_count = state.frontier.count()
            if frontier_count == 0:
                break
            # ONE blocking action (inside run_wave) — it overlaps the
            # previous wave's in-flight background commit
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
                frontier_count=frontier_count,
                # wave 0 of a fresh run: seen is the empty frame by
                # construction — run_wave skips the identity anti-join
                seen_is_empty=fresh_start and state.wave == 0,
            )
            state.metrics.append(out.metrics)
            next_seq = state.next_seq + out.metrics["selected"]
            frontier_count = out.metrics["frontier_size"]
            if progress is not None:
                # M5: per-wave progress callback (e.g. MetricsServer.update)
                progress(state.metrics)

            # barrier the previous wave's commit (it ran concurrently with
            # this wave's job), then retire that wave's caches
            if pending is not None:
                pending.result()
                pending = None
                committed_this_run = True
            for cached_df in retiring:
                cached_df.unpersist()
            retiring = ()

            # bloom update over a bounded-lineage base: once this run has
            # committed, rebase on the committed blobs (lazy parquet read)
            # instead of chaining plan-over-plan wave after wave
            if bloom is not None:
                base_bloom = (
                    store.read_table(spark, "seen_bloom")
                    if store is not None and committed_this_run
                    else state.seen_bloom
                )
                new_bloom = bloom.add(base_bloom, out.processed)
            else:
                new_bloom = None

            if store is not None:
                if new_bloom is not None:
                    new_bloom = new_bloom.persist()
                tables = {
                    "frontier": out.new_frontier,
                    # S7: metrics as a queryable snapshot table, not only
                    # manifest JSON
                    "metrics": metrics_table(spark, state.metrics),
                }
                if new_bloom is not None:
                    tables["seen_bloom"] = new_bloom
                # seen/crawl_order/results grow monotonically: commit only
                # this wave's delta (Iceberg-append semantics) — a
                # cumulative rewrite would cost O(total²) I/O over a long
                # crawl. seen's delta is exactly `processed` (wave step 8:
                # new_seen = seen ∪ processed, disjoint by construction).
                append_tables = {
                    "seen": out.processed,
                    "crawl_order": out.crawl_order,
                    "results": out.results,
                }
                extra = {
                    "next_wave": state.wave + 1,
                    "next_seq": next_seq,
                    # copy: the background json.dump must not see metrics
                    # appended by the NEXT wave
                    "metrics": list(state.metrics),
                }
                if bloom is not None:
                    # record the bloom geometry so resume detects mismatch
                    extra["bloom_params"] = {
                        "partitions": bloom.partitions,
                        "m_bits": bloom.m_bits,
                        "k": bloom.k,
                    }
                snap = state.wave + 1
                compact_now = bool(
                    config.compact_every_n_waves
                    and snap % config.compact_every_n_waves == 0
                )

                def _commit_and_maybe_compact(
                    _snap=snap,
                    _tables=tables,
                    _extra=extra,
                    _appends=append_tables,
                    _compact=compact_now,
                ):
                    store.commit(
                        snapshot=_snap,
                        tables=_tables,
                        extra=_extra,
                        append_tables=_appends,
                    )
                    if _compact:
                        # fold the delta chains while the NEXT wave runs;
                        # superseded delta files stay on disk (Iceberg
                        # expire-snapshots territory), so in-flight lazy
                        # readers of the old path list are unaffected
                        for name in ("seen", "crawl_order", "results"):
                            store.compact(spark, name)

                # resolve the rebase BEFORE submitting the commit:
                # read_table resolves the manifest's delta-path list at
                # CALL time, so reading after the submit races the
                # background CURRENT flip — if the flip lands first, seen
                # would already include this wave's processed delta and
                # the unionByName below would double it
                base_seen = (
                    store.read_table(spark, "seen")
                    if committed_this_run
                    else state.seen
                )
                pending = committer.submit(_commit_and_maybe_compact)
                retiring = out.cached + (
                    (new_bloom,) if new_bloom is not None else ()
                )
                # next-wave state: depth-1 plans over committed parquet +
                # this wave's checkpoint leaves — never reloaded eagerly
                state.frontier = out.new_frontier
                state.seen = base_seen.unionByName(out.processed)
                state.seen_bloom = new_bloom
            else:
                # no store → frontier/processed are already lazy
                # localCheckpoint leaves (run_wave); collapse the seen
                # union chain periodically so a long crawl's plan stays
                # O(1) leaves, and cut the bloom chain every wave (cheap —
                # the blob table is tiny). All lazy: zero extra jobs.
                state.frontier = out.new_frontier
                state.seen = state.seen.unionByName(out.processed)
                if state.wave % 8 == 7:
                    state.seen = state.seen.localCheckpoint(eager=False)
                if new_bloom is not None:
                    state.seen_bloom = new_bloom.localCheckpoint(eager=False)
                retiring = out.cached
            state.wave += 1
            state.next_seq = next_seq
        # the FINAL wave's checkpoint leaves have no next wave (and, with
        # no store, no commit) to materialize them — copy their blocks
        # from the still-hot caches now, before `finally` retires those
        # caches, or every post-crawl action on the returned state would
        # re-run the last wave from scratch (mid-crawl waves get this for
        # free from the next wave's action / the background commit)
        if store is None and retiring:
            # ONE job for both leaves: counting the union computes (and
            # block-copies) both checkpoint RDDs in a single action —
            # two separate counts pay the job-submission latency twice
            from pyspark.sql import functions as F

            state.frontier.select(F.lit(1).alias("__one")).unionByName(
                state.seen.select(F.lit(1).alias("__one"))
            ).count()
    finally:
        if pending is not None:
            pending.result()
        for cached_df in retiring:
            cached_df.unpersist()
        robots.unpersist()
        if committer is not None:
            committer.shutdown()
    if store is not None and store.current_snapshot() is not None:
        # hand back clean lineage-free handles rooted at the final commit
        state.frontier = store.read_table(spark, "frontier")
        state.seen = store.read_table(spark, "seen")
        if bloom is not None:
            try:
                state.seen_bloom = store.read_table(spark, "seen_bloom")
            except FileNotFoundError:
                pass
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
