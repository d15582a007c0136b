"""Dataset-assembly composition: the training-data operators chained the
way a real pipeline chains them — curate → near-dup dedup → train/val/test
split → chunk → pack — with set-containment and packing invariants checked
at every stage boundary. Each operator has its own oracle gate; this suite
pins that they COMPOSE (column contracts line up, survivors flow through,
the packed stream is gapless)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_curate_dedup_split_chunk_pack(spark, docs):
    from nimbus_crawler_spark.operators.chunking import chunk_documents, pack_sequences
    from nimbus_crawler_spark.operators.graph import dedup_survivors
    from nimbus_crawler_spark.operators.sampling import hash_split
    from nimbus_crawler_spark.operators.textdedup import simhash_near_pairs
    from nimbus_crawler_spark.operators.textstats import curation_pipeline

    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}

    # 1. curation: language + quality + repetition gates, exact dedup
    curated = curation_pipeline(docs).select("doc_id").join(docs, "doc_id")
    curated_ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert curated_ids and curated_ids < all_ids  # gates dropped something

    # 2. near-dup dedup over the curated set only
    pairs = simhash_near_pairs(curated, max_hamming=1, bits=16, bands=2)
    kept = dedup_survivors(curated, pairs)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids <= curated_ids
    dropped = curated_ids - kept_ids
    # every dropped doc lost to a smaller-id near-dup that IS kept or was
    # itself transitively clustered — at minimum, dropped docs appeared in
    # a pair
    paired = {r["a"] for r in pairs.collect()} | {r["b"] for r in pairs.collect()}
    assert dropped <= paired

    # 3. deterministic split of the survivors
    split = hash_split(kept, {"train": 0.8, "val": 0.1, "test": 0.1})
    by_split = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(by_split.values()) == len(kept_ids)  # total partition
    train = split.where("split = 'train'").select("doc_id").join(docs, "doc_id")
    train_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert train_ids <= kept_ids and train_ids

    # 4. chunk the train split, 5. pack into fixed sequences
    chunks = chunk_documents(train, chunk_tokens=32, stride=32)
    packed = pack_sequences(chunks, seq_len=128).collect()
    assert {r["doc_id"] for r in packed} <= train_ids

    # packing invariants: offsets are the gapless exclusive prefix sum in
    # (doc_id, chunk_idx) order, and seq/offset columns derive from them
    packed.sort(key=lambda r: (r["doc_id"], r["chunk_idx"]))
    run = 0
    for r in packed:
        assert r["token_offset"] == run
        assert r["seq_id"] == run // 128
        assert r["offset_in_seq"] == run % 128
        run += r["n_chunk_tokens"]
    # total tokens survive the composition end to end
    total = train.select(
        F.sum(
            F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != ""))
        ).alias("n")
    ).collect()[0]["n"]
    assert run == total
