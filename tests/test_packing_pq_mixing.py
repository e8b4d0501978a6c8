"""Tests for the round-2 training-pipeline additions: sequence packing,
corpus mixture sampling, and product quantization."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from buzz_rust_spark.errors import BuzzBadRequestError
from buzz_rust_spark.operators.packing import pack_sequences, packing_stats
from buzz_rust_spark.operators.pq import (
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from buzz_rust_spark.operators.sampling import mix_corpora
from buzz_rust_spark.operators.similarity import cosine_topk_bruteforce
from buzz_rust_spark.operators.text import with_text_stats


# ---------------------------------------------------------------- packing


def _docs_with_tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_text_stats(docs).select("doc_id", "n_tokens")


def test_packing_respects_capacity_and_covers_all_docs(spark, sf_dir):
    docs = _docs_with_tokens(spark, sf_dir)
    cap = 200
    packed = pack_sequences(docs, capacity=cap, truncate_oversize=True)
    stats = packing_stats(packed, capacity=cap)
    # every document lands in exactly one sequence
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # no sequence exceeds capacity
    over = stats.where(F.col("seq_tokens") > cap).count()
    assert over == 0
    # fill is decent: FFD over a real corpus should waste little
    avg_fill = stats.agg(F.avg("fill")).first()[0]
    assert avg_fill > 0.7, f"avg fill {avg_fill}"


def test_packing_deterministic_across_runs(spark, sf_dir):
    docs = _docs_with_tokens(spark, sf_dir)
    a = pack_sequences(docs, capacity=300).orderBy("doc_id").collect()
    b = pack_sequences(docs.repartition(7), capacity=300).orderBy("doc_id").collect()
    assert a == b  # layout-invariant: grouping key is content-derived


def test_packing_oversize_raises_unless_truncated(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, 9000)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="capacity"):
        pack_sequences(docs, capacity=100).collect()
    packed = pack_sequences(docs, capacity=100, truncate_oversize=True)
    rows = {r["doc_id"]: r for r in packed.collect()}
    # the oversize doc keeps its real count but sits alone in its sequence
    assert rows[2]["n_tokens"] == 9000
    seq_of_2 = rows[2]["seq_id"]
    assert sum(1 for r in rows.values() if r["seq_id"] == seq_of_2) == 1


def test_packing_slots_are_dense_per_sequence(spark, sf_dir):
    docs = _docs_with_tokens(spark, sf_dir)
    packed = pack_sequences(docs, capacity=250, truncate_oversize=True)
    bad = (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("seq_slot").alias("mx"),
            F.min("seq_slot").alias("mn"),
        )
        .where((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------------- mixing


def test_mix_corpora_hits_targets(spark, sf_dir):
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = with_text_stats(raw).join(raw.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", "n_tokens"
    )
    web = docs.where(F.col("source").isin("src0", "src1", "src2", "src3"))
    code = docs.where(F.col("source").isin("src4", "src5"))
    total = docs.agg(F.sum("n_tokens")).first()[0]
    budget = int(total * 0.3)
    mixed = mix_corpora(
        {"web": web, "code": code},
        weights={"web": 2.0, "code": 1.0},
        token_budget=budget,
        key_cols=["doc_id"],
    )
    got = {
        r["source_name"]: r["toks"]
        for r in mixed.groupBy("source_name")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    target_web = budget * 2 / 3
    target_code = budget * 1 / 3
    # hash sampling is exact-in-expectation; allow 25% slack on a small corpus
    assert got["web"] == pytest.approx(target_web, rel=0.25)
    assert got["code"] == pytest.approx(target_code, rel=0.25)


def test_mix_corpora_upsamples_with_epochs(spark):
    small = spark.createDataFrame(
        [(i, 100) for i in range(20)], "doc_id long, n_tokens long"
    )
    big = spark.createDataFrame(
        [(1000 + i, 100) for i in range(200)], "doc_id long, n_tokens long"
    )
    mixed = mix_corpora(
        {"small": small, "big": big},
        weights={"small": 1.0, "big": 1.0},
        token_budget=10_000,  # each target 5000; small has only 2000
        key_cols=["doc_id"],
    )
    by_src = {
        r["source_name"]: (r["toks"], r["epochs"])
        for r in mixed.groupBy("source_name")
        .agg(
            F.sum("n_tokens").alias("toks"),
            F.countDistinct("epoch").alias("epochs"),
        )
        .collect()
    }
    toks_small, epochs_small = by_src["small"]
    assert epochs_small >= 2  # full epochs 0 and 1, fractional epoch 2
    assert toks_small == pytest.approx(5000, rel=0.25)
    # no upsampling: the small source contributes at most one full epoch
    capped = mix_corpora(
        {"small": small, "big": big},
        weights={"small": 1.0, "big": 1.0},
        token_budget=10_000,
        key_cols=["doc_id"],
        allow_upsample=False,
    )
    small_toks = (
        capped.where(F.col("source_name") == "small").agg(F.sum("n_tokens")).first()[0]
    )
    assert small_toks == 2000


def test_mix_corpora_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(300)], "doc_id long, n_tokens long"
    )
    kw = dict(weights={"a": 1.0}, token_budget=500, key_cols=["doc_id"])
    a = mix_corpora({"a": docs}, **kw).orderBy("doc_id", "epoch").collect()
    b = mix_corpora({"a": docs.repartition(5)}, **kw).orderBy("doc_id", "epoch").collect()
    assert a == b


def test_mix_corpora_validates(spark):
    docs = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(BuzzBadRequestError, match="weight"):
        mix_corpora({"a": docs}, weights={}, token_budget=100)
    with pytest.raises(BuzzBadRequestError, match="token column"):
        mix_corpora(
            {"a": docs.select("doc_id")}, weights={"a": 1.0}, token_budget=100
        )


# ---------------------------------------------------------------- PQ


def test_pq_roundtrip_bounds_and_recall(spark, sf_dir):
    from buzz_rust_spark.functions.vector import l2_normalize

    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # cosine-search recipe: L2-normalize before encoding, then ADC inner
    # product ranks identically to cosine up to quantization error
    emb = raw.withColumn("embedding", l2_normalize(F.col("embedding")))
    books = train_pq_codebooks(emb, dim=64, m=16, k=128)
    assert books.shape[0] == 16 and books.shape[2] == 4
    codes = pq_encode(emb, books)
    row = codes.first()
    assert len(row["pq_code"]) == 16  # 16 bytes vs 256 for float32[64]

    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    approx = pq_topk(codes, queries, books, k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # pure-ADC floor on unstructured synthetic vectors (the hardest case for
    # PQ: no manifold to exploit); measured above it
    assert recall >= 0.5, f"ADC recall@10 {recall}"

    # two-stage: ADC shortlist + exact re-rank recovers near-exact recall
    # while still scanning only codes
    reranked = pq_topk(
        codes, queries, books, k=10, rerank_corpus=emb, shortlist=100
    )
    r = {(x["query_id"], x["neighbor_id"]) for x in reranked.collect()}
    recall2 = len(e & r) / len(e)
    assert recall2 >= 0.9, f"reranked recall@10 {recall2}"


def test_pq_topk_matches_exact_when_codebook_is_corpus(spark):
    # with k >= corpus size each subvector quantizes to itself -> ADC == exact
    rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = train_pq_codebooks(emb, dim=8, m=2, k=64, sample_size=100, iterations=20)
    codes = pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 3)
    approx = pq_topk(codes, queries, books, k=5)
    assert approx.groupBy("query_id").count().agg(F.min("count")).first()[0] == 5
    # scores must be within quantization error of the true inner product
    truth = {}
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    for r in approx.collect():
        true_ip = float(vecs[r["query_id"]] @ vecs[r["neighbor_id"]])
        truth[(r["query_id"], r["neighbor_id"])] = abs(r["score"] - true_ip)
    assert max(truth.values()) < 2.0


def test_pq_validates(spark):
    emb = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(BuzzBadRequestError, match="divisible"):
        train_pq_codebooks(emb, dim=8, m=3)
    with pytest.raises(BuzzBadRequestError, match="one byte"):
        train_pq_codebooks(emb, dim=8, m=2, k=512)


# --- count-min sketch -------------------------------------------------------


def test_cms_never_undercounts_and_is_tight_on_heavy_hitters(spark):
    from pyspark.sql import functions as F

    from buzz_rust_spark.operators import cms as C

    # zipf-ish corpus: key-0 appears 1000x, key-i appears ~1000/i times
    rows = []
    for i in range(1, 101):
        rows.extend([(f"key-{i}",)] * (1000 // i))
    df = spark.createDataFrame(rows, ["k"])
    true_counts = {f"key-{i}": 1000 // i for i in range(1, 101)}
    sketch = C.cms_build(df, "k", depth=5, width=1 << 12)
    est = {
        r["k"]: r["est_count"]
        for r in C.cms_estimate(
            df.select("k").distinct(), sketch, "k", depth=5, width=1 << 12
        ).collect()
    }
    total = sum(true_counts.values())
    eps_bound = 2.718281828 / (1 << 12) * total
    for k, true in true_counts.items():
        assert est[k] >= true  # one-sided: never undercounts
        assert est[k] <= true + max(3 * eps_bound, 3)
    # the heavy hitter is exact or near-exact at this width
    assert est["key-1"] <= true_counts["key-1"] + 3


def test_cms_merge_and_weighted_build(spark):
    from pyspark.sql import functions as F

    from buzz_rust_spark.operators import cms as C

    a = spark.createDataFrame([("x",)] * 10 + [("y",)] * 5, ["k"])
    b = spark.createDataFrame([("x", 7), ("z", 4)], ["k", "n"])
    sk = C.cms_merge(
        C.cms_build(a, "k", depth=4, width=256),
        C.cms_build(b, "k", weight_col="n", depth=4, width=256),
    )
    probe = spark.createDataFrame([("x",), ("y",), ("z",)], ["k"])
    est = {
        r["k"]: r["est_count"]
        for r in C.cms_estimate(probe, sk, "k", depth=4, width=256).collect()
    }
    assert est["x"] >= 17 and est["y"] >= 5 and est["z"] >= 4


# --- percentile-based quality selection ------------------------------------


def test_top_fraction_by_group_exact_and_approx_agree(spark):
    from pyspark.sql import functions as F

    from buzz_rust_spark.operators.sampling import top_fraction_by_group

    rows = [
        (i, "s1" if i < 100 else "s2", float((i * 37) % 100))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    exact = top_fraction_by_group(df, 0.2, exact=True)
    approx = top_fraction_by_group(df, 0.2, exact=False)
    ne, na = exact.count(), approx.count()
    # 20% of each 100-row group = 20 + 20
    assert ne == 40
    assert abs(na - 40) <= 4  # ties at the approx threshold may widen it
    # every exact pick is at or above the approx threshold set
    exact_ids = {r["doc_id"] for r in exact.collect()}
    approx_ids = {r["doc_id"] for r in approx.collect()}
    assert exact_ids <= approx_ids or approx_ids <= exact_ids
    # per-group floor respected
    per_group = exact.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in per_group} == {"s1": 20, "s2": 20}


def test_top_fraction_rejects_bad_fraction(spark):
    import pytest as _pytest

    from buzz_rust_spark.errors import BuzzBadRequestError
    from buzz_rust_spark.operators.sampling import top_fraction_by_group

    df = spark.createDataFrame([(1, "s", 0.5)], ["doc_id", "source", "quality"])
    with _pytest.raises(BuzzBadRequestError):
        top_fraction_by_group(df, 0.0)


# --- mergeable HLL distinct-count state ------------------------------------


def test_hll_state_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from buzz_rust_spark.operators import sketches as H

    df = spark.range(20000).select(
        (F.col("id") % 2 == 0).cast("string").alias("grp"),
        F.concat(F.lit("k-"), (F.col("id") % 7919)).alias("k"),  # 7919 distinct
    )
    est = {
        r["grp"]: r["n_distinct"]
        for r in H.hll_estimate(
            H.hll_build(df, "k", group_cols=["grp"]), group_cols=["grp"]
        ).collect()
    }
    exact = {
        r["grp"]: r["n"]
        for r in df.groupBy("grp").agg(F.countDistinct("k").alias("n")).collect()
    }
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05
    # merging two half-batch sketches estimates the union within the same
    # error bound (union changes the sketch representation, so estimates
    # are close to — not bit-equal to — the single-pass build)
    a = H.hll_build(df.where(F.col("id") < 10000), "k", group_cols=["grp"])
    b = H.hll_build(df.where(F.col("id") >= 10000), "k", group_cols=["grp"])
    merged_est = {
        r["grp"]: r["n_distinct"]
        for r in H.hll_estimate(
            H.hll_merge(a, b, group_cols=["grp"]), group_cols=["grp"]
        ).collect()
    }
    for g in exact:
        assert abs(merged_est[g] - exact[g]) / exact[g] < 0.05


def test_top_fraction_exact_is_float_safe(spark):
    """Review fix: fraction 0.07 on 100 rows must keep exactly 7 (binary
    float 100*0.07=7.000000000000001 must not ceil to 8)."""
    from buzz_rust_spark.operators.sampling import top_fraction_by_group

    rows = [(i, "s", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    assert top_fraction_by_group(df, 0.07, exact=True).count() == 7


def test_packing_rejects_null_and_negative_counts(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, None)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="null/negative"):
        pack_sequences(docs, capacity=100).collect()
    neg = spark.createDataFrame([(1, 50), (2, -5)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="null/negative"):
        pack_sequences(neg, capacity=100).collect()


def test_salted_aggregate_tolerates_map_columns_and_empty_count(spark):
    """Review fixes: an unrelated map column must not break the salt hash,
    and a global count over empty input returns 0 (not NULL) — exactly what
    the plain groupBy would do."""
    from buzz_rust_spark.functions.skew import salted_aggregate

    df = spark.createDataFrame(
        [(1, 10, {"k": "v"})], "key int, v int, meta map<string,string>"
    )
    out = salted_aggregate(df, ["key"], {"n": ("v", "count"), "s": ("v", "sum")})
    row = out.collect()[0]
    assert row["n"] == 1 and row["s"] == 10
    empty = spark.createDataFrame([], "key int, v int")
    g = salted_aggregate(empty, [], {"n": ("v", "count")}).collect()[0]
    assert g["n"] == 0


def test_int8_mae_empty_array_is_zero(spark):
    from pyspark.sql import functions as F

    from buzz_rust_spark.functions.vector import int8_quantization_mae

    df = spark.createDataFrame([([],), ([1.0, -2.0],)], ["v"])
    out = df.select(int8_quantization_mae(F.col("v")).alias("mae")).collect()
    assert out[0]["mae"] == 0.0 and out[1]["mae"] >= 0.0


def test_pq_topk_rejects_string_ids(spark):
    import numpy as np

    from buzz_rust_spark.operators.pq import pq_topk

    codes = spark.createDataFrame([("a", bytearray(b"\x00"))], ["vec_id", "pq_code"])
    books = np.zeros((1, 1, 2))
    with pytest.raises(BuzzBadRequestError, match="integral id"):
        pq_topk(codes, codes, books, k=1)
