"""Training-corpus preparation operators (operators/training.py):
decontamination, rate rebalancing, sequence packing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from basic_common_crawl_pipeline_spark.operators.training import (
    decontaminate,
    pack_token_stream,
    sample_rebalance,
)


def test_decontaminate_flags_known_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # contains the bench 5-gram "alpha beta gamma delta epsilon"
            (1, "zero alpha beta gamma delta epsilon end"),
            # same tokens, different order — no 5-gram overlap
            (2, "epsilon delta gamma beta alpha zeta more words here"),
            # shorter than one 5-gram window
            (3, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, n=5, min_matches=1).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["n_matched"] == 1
    assert not rows[2]["contaminated"] and rows[2]["n_matched"] == 0
    assert rows[3]["n_grams"] == 0 and not rows[3]["contaminated"]


def test_decontaminate_counts_multiplicity(spark):
    bench = spark.createDataFrame([(9, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "a b c d e x a b c d e")], ["doc_id", "text"]
    )
    (row,) = decontaminate(corpus, bench, n=5).collect()
    # the bench 5-gram "a b c d e" occurs twice in the corpus doc
    assert row["n_matched"] == 2 and row["n_grams"] == 7


def test_sample_rebalance_rates_and_nesting(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh") for i in range(400)],
        ["doc_id", "lang"],
    )
    full = sample_rebalance(df, {"en": 1.0, "zh": 1.0}).collect()
    assert len(full) == 400  # rate 1.0 keeps everything
    none = sample_rebalance(df, {"en": 1.0}, default_rate=0.0)
    assert none.filter(F.col("lang") == "zh").count() == 0
    half = {
        r["doc_id"] for r in sample_rebalance(df, {"en": 0.5, "zh": 0.5}).collect()
    }
    quarter = {
        r["doc_id"]
        for r in sample_rebalance(df, {"en": 0.25, "zh": 0.25}).collect()
    }
    assert quarter <= half  # nested samples: lowering a rate only removes
    assert 0 < len(quarter) < len(half) < 400


def test_sample_rebalance_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(300)], ["doc_id", "lang"]
    )
    rates = {"en": 0.4, "de": 0.7}
    a = {r["doc_id"] for r in sample_rebalance(df, rates).collect()}
    b = {
        r["doc_id"]
        for r in sample_rebalance(df.repartition(7), rates).collect()
    }
    assert a == b


def test_repetition_stats_longest_run_is_top_gram_count(spark):
    from basic_common_crawl_pipeline_spark.functions.textstats import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a b c"),  # 2-grams: "a b"×3, "b a"×2, "b c"×1
            (2, "x y z"),  # all distinct
            (3, "one"),  # shorter than one 2-gram
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in df.withColumn("s", repetition_stats("text", n=2))
        .select(
            "doc_id",
            F.col("s.n_grams").alias("n"),
            F.col("s.n_distinct").alias("d"),
            F.col("s.top_count").alias("t"),
        )
        .collect()
    }
    assert (rows[1]["n"], rows[1]["d"], rows[1]["t"]) == (6, 3, 3)
    assert (rows[2]["n"], rows[2]["d"], rows[2]["t"]) == (2, 2, 1)
    assert (rows[3]["n"], rows[3]["d"], rows[3]["t"]) == (0, 0, 0)


def _pack_reference(rows, budget):
    """Pure-Python packing reference: (doc_id, n_tok) sorted by doc_id."""
    out, off = {}, 0
    for doc_id, n_tok in sorted(rows):
        pack = off // budget
        straddles = n_tok > 0 and (off + n_tok - 1) // budget != pack
        out[doc_id] = (off, pack, straddles)
        off += n_tok
    return out


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_pack_token_stream_matches_reference(spark, n_parts):
    rows = [(i, (i * 37) % 23) for i in range(200)]  # includes n_tok == 0
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"]).repartition(n_parts)
    cache = []
    got = {
        r["doc_id"]: (r["start_off"], r["pack_id"], r["straddles"])
        for r in pack_token_stream(
            df, ["doc_id"], "n_tok", budget=64, cache=cache
        ).collect()
    }
    for c in cache:
        c.unpersist()
    assert got == _pack_reference(rows, 64)


def test_pack_token_stream_offsets_are_contiguous(spark):
    rows = [(i, 10 + i % 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    cache = []
    out = (
        pack_token_stream(df, ["doc_id"], "n_tok", budget=128, cache=cache)
        .orderBy("doc_id")
        .collect()
    )
    for c in cache:
        c.unpersist()
    off = 0
    for r in out:
        assert r["start_off"] == off
        off += r["n_tok"]


def test_pack_token_stream_property(spark):
    """Hypothesis sweep: random token counts (zeros, duplicates of the
    order key never occur — doc_id is unique), random budgets, and two
    shuffle-partition counts must all reproduce the Python prefix-sum
    reference exactly (partition boundaries are the only moving part)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        toks=st.lists(
            st.integers(min_value=0, max_value=40), min_size=0, max_size=60
        ),
        budget=st.integers(min_value=1, max_value=64),
    )
    def run(toks, budget):
        rows = list(enumerate(toks))
        if not rows:
            return
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        old = spark.conf.get("spark.sql.shuffle.partitions")
        cache = []
        try:
            for n_parts in ("2", "9"):
                spark.conf.set("spark.sql.shuffle.partitions", n_parts)
                got = {
                    r["doc_id"]: (r["start_off"], r["pack_id"], r["straddles"])
                    for r in pack_token_stream(
                        df, ["doc_id"], "n_tok", budget=budget, cache=cache
                    ).collect()
                }
                assert got == _pack_reference(rows, budget), (n_parts, budget)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            for c in cache:
                c.unpersist()

    run()


# ---------------------------------------------------------------------------
# line-level dedup (operators/dedup.py::line_dedup)
# ---------------------------------------------------------------------------


def _line_dedup_rows(spark, docs, n_parts=None, **kw):
    from basic_common_crawl_pipeline_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    if n_parts is not None:
        df = df.repartition(n_parts)
    return {r["doc_id"]: r for r in line_dedup(df, **kw).collect()}


_LINE_DOCS = [
    # "boiler" is in docs 1,2,3 → dropped everywhere; "unique N" kept;
    # doc 2 repeats "twice" twice but only within itself → kept both
    # times; doc 3 is all boilerplate → empty output text, row retained;
    # doc 4 has an empty line ("a\n\nb") that must never be dropped even
    # though empty lines repeat across docs.
    (1, "boiler\nunique one"),
    (2, "twice\nboiler\ntwice"),
    (3, "boiler"),
    (4, "a\n\nb"),
    (5, "c\n\nd"),
]


def test_line_dedup_semantics(spark):
    rows = _line_dedup_rows(spark, _LINE_DOCS)
    assert rows[1]["text_deduped"] == "unique one"
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (2, 1)
    # within-doc repetition is NOT cross-doc duplication: both kept
    assert rows[2]["text_deduped"] == "twice\ntwice"
    assert rows[2]["n_kept"] == 2
    # a fully-boilerplate doc keeps its row with empty text
    assert rows[3]["text_deduped"] == "" and rows[3]["n_kept"] == 0
    # empty lines survive even though '' occurs in docs 4 and 5
    assert rows[4]["text_deduped"] == "a\n\nb"
    assert rows[5]["text_deduped"] == "c\n\nd"
    assert len(rows) == len(_LINE_DOCS)


def test_line_dedup_min_docs_threshold(spark):
    # with min_docs=4 nothing reaches the threshold → identity
    rows = _line_dedup_rows(spark, _LINE_DOCS, min_docs=4)
    for doc_id, text in _LINE_DOCS:
        assert rows[doc_id]["text_deduped"] == text
        assert rows[doc_id]["n_kept"] == rows[doc_id]["n_lines"]


@pytest.mark.parametrize("n_parts", [1, 7])
def test_line_dedup_partition_invariant(spark, n_parts):
    base = _line_dedup_rows(spark, _LINE_DOCS)
    parted = _line_dedup_rows(spark, _LINE_DOCS, n_parts=n_parts)
    for doc_id in base:
        assert parted[doc_id] == base[doc_id]


# ---------------------------------------------------------------------------
# PII redaction (functions/textstats.py::redact_pii / pii_counts)
# ---------------------------------------------------------------------------


def test_redact_pii_masks_and_counts(spark):
    from basic_common_crawl_pipeline_spark.functions.textstats import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_9@sub.example.org and x@y.io end"),
            (2, "call +1-555-0142 or +44-555-9999 now"),
            (3, "hosts 10.0.0.1 and 192.168.255.12."),
            # dotted digits inside an email local part must be consumed
            # by the email pass, not the IP pass
            (4, "user.1.2.3.4x@example.com stays one email"),
            (5, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("t"),
            pii_counts("text").alias("c"),
        ).collect()
    }
    assert out[1]["t"] == "mail <EMAIL> and <EMAIL> end"
    assert out[1]["c"]["n_emails"] == 2
    assert out[2]["t"] == "call <PHONE> or <PHONE> now"
    assert out[2]["c"]["n_phones"] == 2
    assert out[3]["t"] == "hosts <IP> and <IP>."
    assert out[3]["c"]["n_ips"] == 2
    assert out[4]["t"] == "<EMAIL> stays one email"
    assert (out[4]["c"]["n_emails"], out[4]["c"]["n_ips"]) == (1, 0)
    assert out[5]["t"] == "clean text with no pii at all"
    assert (
        out[5]["c"]["n_emails"],
        out[5]["c"]["n_phones"],
        out[5]["c"]["n_ips"],
    ) == (0, 0, 0)


# ---------------------------------------------------------------------------
# unigram LM quality (operators/training.py::unigram_lm_score)
# ---------------------------------------------------------------------------


def test_unigram_lm_score_exact_counts(spark):
    from basic_common_crawl_pipeline_spark.operators.training import (
        unigram_lm_score,
    )

    # global freqs: aa=4, bb=3, cc=2, dd=2, zz=1. vocab_size=3 keeps
    # {aa, bb, cc}: at the freq-2 boundary the (count desc, token asc)
    # tie-break deterministically picks cc over dd.
    docs = [
        (1, "aa aa bb cc"),
        (2, "aa bb dd"),
        (3, "aa bb cc dd"),
        (4, "zz"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {
        r["doc_id"]: r for r in unigram_lm_score(df, vocab_size=3).collect()
    }
    # doc 1: all in vocab; sum_freq = 4+4+3+2
    assert (rows[1]["n_tok"], rows[1]["n_oov"], rows[1]["sum_freq"]) == (
        4, 0, 13,
    )
    # doc 2: dd is OOV (lost the boundary tie) → 4+3
    assert (rows[2]["n_tok"], rows[2]["n_oov"], rows[2]["sum_freq"]) == (
        3, 1, 7,
    )
    assert rows[2]["oov_ratio"] == pytest.approx(0.3333, abs=1e-9)
    # doc 3: 4+3+2, dd OOV
    assert (rows[3]["n_oov"], rows[3]["sum_freq"]) == (1, 9)
    # doc 4: fully OOV
    assert (rows[4]["n_oov"], rows[4]["sum_freq"], rows[4]["oov_ratio"]) == (
        1, 0, 1.0,
    )


def test_unigram_lm_score_case_folds_and_partition_invariant(spark):
    from basic_common_crawl_pipeline_spark.operators.training import (
        unigram_lm_score,
    )

    docs = [(i, f"Tok tok TOK extra{i % 3}") for i in range(30)]
    base = spark.createDataFrame(docs, ["doc_id", "text"])
    a = {r["doc_id"]: r for r in unigram_lm_score(base, vocab_size=2).collect()}
    b = {
        r["doc_id"]: r
        for r in unigram_lm_score(base.repartition(7), vocab_size=2).collect()
    }
    assert a == b
    # case folding: Tok/tok/TOK are one vocab entry with freq 90
    assert a[0]["sum_freq"] >= 270


# ---------------------------------------------------------------------------
# packed-shard sink (operators/training.py::write_packed_shards)
# ---------------------------------------------------------------------------


def test_write_packed_shards_roundtrip_and_pruning(spark, tmp_path):
    from basic_common_crawl_pipeline_spark.operators.training import (
        pack_token_stream,
        write_packed_shards,
    )

    docs = [(i, 3 + (i * 7) % 5) for i in range(200)]  # (doc_id, n_tok)
    df = spark.createDataFrame(docs, ["doc_id", "n_tok"])
    cache = []
    packed = pack_token_stream(
        df, ["doc_id"], "n_tok", budget=10, cache=cache
    )
    expected = {tuple(r) for r in packed.collect()}

    out = write_packed_shards(
        packed, str(tmp_path / "shards"), budget=10, seqs_per_shard=4
    )
    got = {
        (r["doc_id"], r["n_tok"], r["start_off"], r["pack_id"], r["straddles"])
        for r in out.collect()
    }
    assert got == expected  # lossless round-trip

    # shard assignment rule: first-token shard, = pack_id // seqs_per_shard
    bad = out.filter(
        F.col("shard_id") != F.floor(F.col("pack_id") / 4)
    ).count()
    assert bad == 0

    # a dataloader's shard fetch is partition-PRUNED, not a full scan
    plan = (
        out.filter(F.col("shard_id") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "shard_id" in plan.split(
        "PartitionFilters", 1
    )[1][:200]

    # in-shard stream order is one bounded sort on read: offsets within
    # a shard, sorted by start_off, are contiguous (each next start ==
    # prev start + prev n_tok) except across straddled boundaries where
    # the stream continues exactly as well — i.e. global contiguity
    # restricted to the shard's rows
    rows = sorted(
        out.filter(F.col("shard_id") == 0).collect(),
        key=lambda r: r["start_off"],
    )
    for a, b in zip(rows, rows[1:]):
        assert b["start_off"] == a["start_off"] + a["n_tok"]
    for c in cache:
        c.unpersist()


# ---------------------------------------------------------------------------
# keyed two-phase prefix sum + token-budget source sampling
# ---------------------------------------------------------------------------


def _keyed_cum_reference(rows):
    """rows: (id, key, order, v) → {(key, id): cum_before} per key in
    order-asc (order totals within a key)."""
    out, acc = {}, {}
    for rid, key, order, v in sorted(rows, key=lambda r: (r[1], r[2])):
        out[(key, rid)] = acc.get(key, 0)
        acc[key] = acc.get(key, 0) + v
    return out


@pytest.mark.parametrize("n_parts", [2, 8])
def test_keyed_prefix_sum_matches_reference(spark, n_parts):
    """Per-key exactness under any layout, INCLUDING a 90%-one-key hot
    distribution — the case the per-key-window alternative serializes."""
    from basic_common_crawl_pipeline_spark.operators.training import (
        keyed_prefix_sum,
    )

    rows = [
        (i, "hot" if i % 10 else f"cold{i % 3}", (i * 17) % 251, 1 + i % 7)
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id long, key string, ord long, v long"
    ).repartition(n_parts)
    cache = []
    got = {
        (r["key"], r["id"]): r["cum_before"]
        for r in keyed_prefix_sum(
            df, ["key"], ["ord", "id"], "v", cache=cache
        ).collect()
    }
    for c in cache:
        c.unpersist()
    assert got == _keyed_cum_reference(rows)


def test_keyed_prefix_sum_window_is_partition_local(spark):
    """The scale claim, physically: the only Window partitions by the
    PHYSICAL partition id alongside the key (bounded by partition size,
    never by a key's frequency) — a bare per-key window must not appear."""
    from basic_common_crawl_pipeline_spark.operators.training import (
        keyed_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, "k", i, 1) for i in range(50)],
        "id long, key string, ord long, v long",
    )
    cache = []
    out = keyed_prefix_sum(df, ["key"], ["ord", "id"], "v", cache=cache)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for c in cache:
        c.unpersist()
    window_lines = [ln for ln in plan.splitlines() if "Window " in ln]
    assert window_lines, plan
    for ln in window_lines:
        assert "__pid" in ln, ln  # partition-local, not per-key


def test_token_budget_sample_greedy_prefix_rule(spark):
    """Selection == pure-Python reference: per source, docs in md5-coin
    order accumulate until the budget; keep iff cum_before < budget (the
    last kept doc may overshoot); selection is layout-independent."""
    import hashlib

    from basic_common_crawl_pipeline_spark.operators.training import (
        token_budget_sample,
    )

    rows = [(i, f"s{i % 3}", 10 + (i * 13) % 40) for i in range(60)]
    budgets = {"s0": 120, "s1": 55}
    default = 30

    def coin(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    expect = {}
    acc = {}
    for i, s, v in sorted(rows, key=lambda r: (r[1], coin(r[0]), r[0])):
        before = acc.get(s, 0)
        expect[i] = (before, before < budgets.get(s, default))
        acc[s] = before + v

    for n_parts in (1, 8):
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tok long"
        ).repartition(n_parts)
        cache = []
        got = {
            r["doc_id"]: (r["cum_before"], r["kept"])
            for r in token_budget_sample(
                df, budgets, default_budget=default, cache=cache
            ).collect()
        }
        for c in cache:
            c.unpersist()
        assert got == expect


def test_keyed_prefix_sum_null_keys_survive(spark):
    """NULL-key rows form their own partition (null-safe base join) —
    a plain equality join would silently drop them."""
    from basic_common_crawl_pipeline_spark.operators.training import (
        keyed_prefix_sum,
    )

    rows = [(1, None, 1, 5), (2, None, 2, 7), (3, "k", 1, 11)]
    df = spark.createDataFrame(rows, "id long, key string, ord long, v long")
    cache = []
    got = {
        r["id"]: r["cum_before"]
        for r in keyed_prefix_sum(
            df, ["key"], ["ord", "id"], "v", cache=cache
        ).collect()
    }
    for c in cache:
        c.unpersist()
    assert got == {1: 0, 2: 5, 3: 0}


def test_pid_layout_guard_fires_on_drift(spark):
    """check_pid_layout is the loud version of the two-phase prefix-sum
    persist dependency (keyed_prefix_sum / asof_join): a coalesced or
    re-planned layout, or a summary pid outside the requested range,
    must raise instead of silently misnumbering carry state."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from basic_common_crawl_pipeline_spark.operators.ordering import (
        check_pid_layout,
    )

    df = (
        spark.range(100)
        .repartitionByRange(4, "id")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        pids = [r["__pid"] for r in df.select("__pid").distinct().collect()]
        check_pid_layout(df, 4, pids)  # healthy layout passes
        with _pytest.raises(AssertionError, match="coalesced"):
            check_pid_layout(df, 2, pids)  # actual exceeds requested
        with _pytest.raises(AssertionError, match="drifted"):
            check_pid_layout(df, 4, [0, 7])  # pid outside the layout
    finally:
        df.unpersist()


def test_pack_token_ids_reassembles_exact_stream(spark):
    """pack_token_ids (operators/training.py): concatenating the output
    sequences in pack_id order reproduces the exact id stream of the
    input docs in doc order; every sequence except possibly the last is
    exactly budget ids; boundary-crossing docs split mid-document."""
    from basic_common_crawl_pipeline_spark.operators.training import (
        pack_token_ids,
    )

    rows = [
        (1, "1 2 3"),
        (2, ""),  # empty doc MID-stream: zero tokens, must not shift offsets
        (3, "4 5 6 7 8"),
        (4, "9"),
        (5, "10 11 12 13"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ids_csv"])
    cache: list = []
    out = sorted(
        (r["pack_id"], r["n_ids"], r["ids_csv"])
        for r in pack_token_ids(df, ["doc_id"], budget=4, cache=cache).collect()
    )
    for c in cache:
        c.unpersist()
    stream = " ".join(t for _, t in rows if t).split()
    want = [
        (i, len(stream[i * 4 : (i + 1) * 4]), " ".join(stream[i * 4 : (i + 1) * 4]))
        for i in range((len(stream) + 3) // 4)
    ]
    assert out == [(int(p), int(n), s) for p, n, s in want]
    # 13 ids -> packs of 4,4,4,1; doc 2 straddles packs 0/1
    assert [n for _, n, _ in out] == [4, 4, 4, 1]
