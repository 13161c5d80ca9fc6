"""main.py `prep` subcommand — the training-data pipeline as one
spark-submit job: exact dedup → repetition gate → [decontaminate] →
BPE encode → pack → id shards. Run here through _run_prep directly
(the spark-submit surface itself is exercised by the demo run recorded
in README; the composition logic is what this pins)."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F


def test_prep_pipeline_end_to_end(spark, tmp_path, capsys):
    import main as main_mod

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "unique words here about spark and parquet files friend"),
            # repetitive doc: one 2-gram dominates -> repetition gate
            (4, "spam ham " * 12),
            (5, "benchmark sentence that must be dropped by decontamination pass"),
            (6, "another clean document with enough distinct words to pass"),
        ],
        ["doc_id", "text"],
    )
    doc_path = str(tmp_path / "docs")
    docs.write.parquet(doc_path)
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(1, "benchmark sentence that must be dropped by decontamination")],
        ["bid", "text"],
    ).write.parquet(bench_path)

    args = argparse.Namespace(
        documents=doc_path,
        out=str(tmp_path / "shards"),
        benchmark=bench_path,
        merges=3,
        budget=8,
        seqs_per_shard=4,
    )
    main_mod._run_prep(spark, args)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # doc 2 = exact dup of 1; doc 4 = repetition-gated; doc 5 = contaminated
    assert summary["docs_in"] == 6
    assert summary["docs_kept"] == 3
    assert summary["merges"] == 3
    assert summary["sequences"] >= 1 and summary["shards"] >= 1

    out = spark.read.parquet(args.out)
    rows = out.collect()
    assert summary["sequences"] == len(rows)
    # every sequence except possibly the last is exactly budget ids
    sizes = [
        r["n_ids"] for r in sorted(rows, key=lambda r: r["pack_id"])
    ]
    assert all(s == 8 for s in sizes[:-1]) and 1 <= sizes[-1] <= 8
    assert summary["tokens"] == sum(sizes)
    # shard partitioning: pack 0..3 -> shard 0, 4..7 -> shard 1, ...
    for r in rows:
        assert r["shard_id"] == r["pack_id"] // 4
    # total ids equal the kept docs' token-piece mass (stream equality)
    total = out.agg(F.sum("n_ids")).collect()[0][0]
    assert total == summary["tokens"]
