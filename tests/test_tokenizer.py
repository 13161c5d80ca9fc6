"""BPE tokenizer training/application (operators/tokenizer.py) and the
BM25 retrieval entry: Spark results vs a pure-Python reference, plus the
physical-plan pins that carry the 100-TB claims."""

import random

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

from basic_common_crawl_pipeline_spark.operators.tokenizer import (
    _merge_fold,
    bpe_segment_words,
    bpe_train,
)


def py_greedy_merge(syms, a, b):
    """Reference greedy left-to-right single-pass BPE merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def py_bpe_train(word_freq, k):
    """Reference BPE trainer over a word-frequency dict: weighted pair
    counts (overlapping occurrences counted, as in Sennrich), total
    (count desc, pair asc) tie order, greedy merge application."""
    syms = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(1, k + 1):
        counts = {}
        for w, f in word_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        syms = {w: py_greedy_merge(s, a, b) for w, s in syms.items()}
    return merges, syms


def test_merge_fold_matches_python_greedy(spark):
    """The JVM array fold == the reference greedy merge on seeded-random
    symbol sequences, including the self-overlap (a == b) runs the fold's
    carry accumulator exists for ('l l l' -> ['ll', 'l'])."""
    rng = random.Random(7)
    alphabet = ["a", "b", "c"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randrange(0, 12))]
        for _ in range(300)
    ]
    cases += [["a"] * n for n in range(1, 8)]  # pure runs: worst overlap
    rows = [(i, syms) for i, syms in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, syms array<string>")
    for a, b in [("a", "b"), ("a", "a"), ("c", "a")]:
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i", _merge_fold(F.col("syms"), a, b).alias("m")
            ).collect()
        }
        for i, syms in rows:
            assert got[i] == py_greedy_merge(syms, a, b), (i, syms, a, b)


def test_bpe_train_matches_python_reference(spark):
    """End-to-end trainer equality on a corpus with Zipf-ish word reuse:
    identical merge rules (rank, pair, weighted count) and identical
    final segmentations for every distinct word."""
    rng = random.Random(11)
    vocab = ["alpha", "beta", "abab", "banana", "bb", "a", "cabbage"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 20))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    word_freq = {}
    for _, text in docs:
        for w in text.split(" "):
            word_freq[w] = word_freq.get(w, 0) + 1
    ref_merges, ref_syms = py_bpe_train(word_freq, 5)

    cache = []
    merges, words = bpe_train(df, num_merges=5, cache=cache)
    assert merges == ref_merges
    got_syms = {r["word"]: r["syms"] for r in words.collect()}
    assert got_syms == ref_syms

    seg = {
        r["doc_id"]: r
        for r in bpe_segment_words(df, words).collect()
    }
    for doc_id, text in docs:
        ws = text.split(" ")
        assert seg[doc_id]["n_words"] == len(ws)
        assert seg[doc_id]["n_pieces"] == sum(len(ref_syms[w]) for w in ws)
        assert seg[doc_id]["max_word_pieces"] == max(
            len(ref_syms[w]) for w in ws
        )
        assert seg[doc_id]["n_oov"] == 0  # application corpus == training
    for f in cache:
        f.unpersist()


def test_bpe_train_deterministic_across_partitionings(spark):
    """The learned vocabulary is reproducible at any parallelism: pair
    counts are exact integers and the top-1 order is total, so layout
    must not matter."""
    docs = [(i, "abab abba baab" if i % 3 else "aa bb abab") for i in range(30)]
    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(
            docs, "doc_id long, text string"
        ).repartition(parts)
        cache = []
        merges, _ = bpe_train(df, num_merges=4, cache=cache)
        outs.append(merges)
        for f in cache:
            f.unpersist()
    assert outs[0] == outs[1]


def test_bm25_plan_is_narrow_scan_plus_broadcast(spark):
    """The BM25 claim, physically: per-doc tf/dl are computed inside the
    scan projection (no explode), the global stats row arrives by
    broadcast, the top-k is TakeOrderedAndProject — and there is NO
    hash-partitioned exchange anywhere (the only shuffle is the
    SinglePartition reduce of the tiny stats aggregate)."""
    from basic_common_crawl_pipeline_spark.plans import catalog

    df = catalog.QUERIES["text_bm25_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats, cross shape
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" not in plan  # no explode: tf is a per-row filter
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_bpe_train_dry_round_breaks_early_and_matches_oracle(spark):
    """When merges run dry before num_merges (every word reduced to one
    symbol), Spark breaks early; the oracle's LEFT JOIN ON TRUE must
    pass symbols through the empty rounds unchanged — a CROSS JOIN
    against the empty top would annihilate the symbol table and zero
    out the tokenize oracle."""
    import duckdb

    from basic_common_crawl_pipeline_spark.plans import catalog

    docs = [(i, "ab ab ab") for i in range(5)]  # ONE merge possible
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cache = []
    merges, words = bpe_train(df, num_merges=4, cache=cache)
    assert [(r, a, b) for r, a, b, _ in merges] == [(1, "a", "b")]

    chain = catalog._BPE_BASE + "," + ",".join(
        catalog._bpe_round_sql(r) for r in range(1, 5)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, 'ab ab ab')" for i in range(5))
        + ") t(doc_id, text)"
    )
    orc = con.execute(
        "WITH " + chain + ", pieces AS (SELECT word, CAST(count(*) AS "
        "BIGINT) AS np FROM s5 GROUP BY word) SELECT word, np FROM pieces"
    ).fetchall()
    assert orc == [("ab", 1)]  # survived rounds 2-4 dry, fully merged

    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["n_oov"])
        for r in bpe_segment_words(df, words).collect()
    }
    assert got == {i: (3, 3, 0) for i in range(5)}
    for f in cache:
        f.unpersist()


def test_bpe_segment_words_counts_oov_with_char_fallback(spark):
    """Applying a trained dictionary to a DIFFERENT corpus: unseen words
    must not vanish (the inner-join bug) — they char-segment and count
    into n_oov."""
    train = spark.createDataFrame(
        [(1, "abab abab")], "doc_id long, text string"
    )
    cache = []
    _merges, words = bpe_train(train, num_merges=2, cache=cache)
    apply_corpus = spark.createDataFrame(
        [(7, "abab zzz qqqq")], "doc_id long, text string"
    )
    r = bpe_segment_words(apply_corpus, words).collect()[0]
    # 'abab' merges to ONE piece in 2 rounds ((a,b) then (ab,ab));
    # 'zzz'/'qqqq' are OOV -> character fallback 3 and 4 pieces
    assert r["n_words"] == 3 and r["n_oov"] == 2
    assert r["n_pieces"] == 1 + 3 + 4
    assert r["max_word_pieces"] == 4
    for f in cache:
        f.unpersist()


def test_bm25_indexed_equals_full_scan_on_matching_docs(spark, tmp_path):
    """The inverted-index probe (operators/retrieval.py) reproduces the
    full-scan BM25 entry EXACTLY — same doc ids, same bit-for-bit
    scores (one shared score expression) — on a corpus where zero-match
    docs exist (they are not retrievable; the full-scan side filters
    them the same way its matching_only oracle does)."""
    from basic_common_crawl_pipeline_spark.operators import retrieval
    from basic_common_crawl_pipeline_spark.plans.catalog import (
        _BM25_TERMS,
        text_bm25_topk,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25_idx")
    retrieval.write_inverted_index(docs, path)
    got = retrieval.bm25_topk_indexed(
        spark, path, _BM25_TERMS, k=10
    ).collect()
    want = text_bm25_topk(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert all(r["score"] > 0 for r in got)

    # zero-match docs are genuinely absent from the index's reach
    novel = spark.createDataFrame(
        [(900001, "entirely unrelated words"), (900002, "spark spark")],
        "doc_id long, text string",
    )
    p2 = str(tmp_path / "bm25_idx2")
    retrieval.write_inverted_index(novel, p2)
    out = retrieval.bm25_topk_indexed(spark, p2, _BM25_TERMS, k=10).collect()
    assert [r["doc_id"] for r in out] == [900002]
    assert out[0]["tf_spark"] == 2 and out[0]["dl"] == 2


def test_bpe_encode_ids_match_reference_and_handle_oov(spark):
    """bpe_encode (operators/tokenizer.py): token ids equal a pure-
    Python replay — lexicographic piece vocabulary over the final
    symbol table, per-word piece sequences flattened in (token, piece)
    order — and the two OOV levels behave: an unseen WORD falls back to
    character pieces, an unseen CHARACTER encodes as unk_id=-1."""
    from basic_common_crawl_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
        bpe_vocab,
    )

    train_rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "low new list"),
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    cache: list = []
    _merges, words = bpe_train(train, num_merges=4, cache=cache)
    vocab = bpe_vocab(words)
    word_syms = {r["word"]: list(r["syms"]) for r in words.collect()}
    rank = {p: i for i, p in enumerate(vocab)}

    apply_rows = [
        (10, "low newest low"),
        (11, "lowest unseen low"),   # 'unseen' is OOV -> char pieces
        (12, "zebra! low"),          # '!' never trained -> unk id
    ]
    app = spark.createDataFrame(apply_rows, ["doc_id", "text"])

    def ref_encode(text):
        ids = []
        for w in text.split():
            w = w.lower()
            pieces = word_syms.get(w, list(w))
            ids += [rank.get(p, -1) for p in pieces]
        return ids

    got = {
        r["doc_id"]: r
        for r in bpe_encode(app, words, vocab).collect()
    }
    for doc_id, text in apply_rows:
        want = ref_encode(text)
        r = got[doc_id]
        assert [int(x) for x in r["ids_csv"].split(" ")] == want, (doc_id, r)
        assert r["n_pieces"] == len(want)
        assert r["ids_sum"] == sum(want)
    # the unseen character really went through the unk path
    assert -1 in [int(x) for x in got[12]["ids_csv"].split(" ")]
    for c in cache:
        c.unpersist()


def test_bpe_train_local_equals_distributed(spark):
    """r6 pin: the bounded driver-side merge loop (default when the word
    table fits) must reproduce the distributed rounds exactly — same
    merges, same final symbol table."""
    from basic_common_crawl_pipeline_spark.operators.tokenizer import (
        bpe_train,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c1: list = []
    c2: list = []
    merges_local, words_local = bpe_train(docs, num_merges=6, cache=c1)
    merges_dist, words_dist = bpe_train(
        docs, num_merges=6, cache=c2, driver_train_max_words=0
    )
    assert merges_local == merges_dist
    got = {
        r["word"]: (r["freq"], list(r["syms"]))
        for r in words_local.collect()
    }
    want = {
        r["word"]: (r["freq"], list(r["syms"]))
        for r in words_dist.collect()
    }
    assert got == want
    for c in c1 + c2:
        c.unpersist()
