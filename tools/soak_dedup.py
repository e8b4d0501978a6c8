"""Scale soak for the dedup family: does runtime scale ~linearly with corpus
size, and do the df-cap assumptions hold one notch up from the bench sf?

Generates two deterministic synthetic corpora with the SAME distribution as
the driver's documents table (word frequencies and document lengths sampled
from the real sf0.1 corpus, seeded): a base corpus matching sf0.1 (5k docs)
and a 10x corpus (~sf1, 50k docs).  Runs d02 (n-gram Jaccard), d03
(MinHash LSH), and d07 (paragraph dedup) on both and prints the time ratios
— linear scaling means ratio ≈ corpus ratio (10).  Also reports the largest
shingle bucket vs the df-cap.

Usage: python tools/soak_dedup.py  (writes corpora under /tmp/sfsoak)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(out_path: str, n_docs: int, seed: int) -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    words_df = duckdb.query(
        "SELECT unnest(string_split(text, ' ')) AS w FROM "
        "'/root/testdata/sf0.1/documents.parquet'"
    ).df()
    counts = words_df["w"].value_counts()
    vocab = counts.index.to_numpy()
    probs = (counts / counts.sum()).to_numpy()
    lens_real = duckdb.query(
        "SELECT length(string_split(text, ' ')) AS n FROM "
        "'/root/testdata/sf0.1/documents.parquet'"
    ).df()["n"].to_numpy()

    rng = np.random.RandomState(seed)
    doc_lens = rng.choice(lens_real, size=n_docs)
    texts = []
    for n in doc_lens:
        toks = rng.choice(vocab, size=int(n), p=probs)
        # newline every ~12 words so paragraph dedup has real paragraphs
        parts = [
            " ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)
        ]
        texts.append("\n".join(parts))
    # 2% near-duplicates: copy an earlier doc and perturb one token
    n_dups = n_docs // 50
    dup_src = rng.randint(0, n_docs - n_dups, size=n_dups)
    for k, src in enumerate(dup_src):
        t = texts[src].split(" ")
        t[rng.randint(0, len(t))] = str(rng.choice(vocab))
        texts[n_docs - n_dups + k] = " ".join(t)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(["soak"] * n_docs),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, out_path)


def main() -> None:
    from pyspark.sql import functions as F

    from buzz_rust_spark.functions.cache import release_operator_caches
    from buzz_rust_spark.operators import dedup as D
    from buzz_rust_spark.session import get_spark

    root = "/tmp/sfsoak"
    os.makedirs(root, exist_ok=True)
    base, big = f"{root}/docs_5k.parquet", f"{root}/docs_50k.parquet"
    if not os.path.exists(base):
        make_corpus(base, 5_000, seed=7)
    if not os.path.exists(big):
        make_corpus(big, 50_000, seed=11)

    spark = get_spark(app_name="soak-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "d02_ngram_jaccard": lambda df: D.ngram_jaccard_pairs(df, threshold=0.8),
        "d03_minhash_lsh": lambda df: D.minhash_lsh_pairs(df, threshold=0.8),
        "d07_paragraph_dedup": lambda df: D.paragraph_dedup(df, min_chars=10),
        "d09_repeated_spans": lambda df: D.repeated_spans(df, span=10),
        "d10_span_scrub": lambda df: D.scrub_repeated_spans(df, span=10),
    }
    results: dict[str, dict[str, float]] = {}
    for path, label in ((base, "5k"), (big, "50k")):
        df = spark.read.parquet(path)
        for name, op in ops.items():
            best = float("inf")
            for _ in range(3):
                release_operator_caches()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                op(df).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[label] = round(best, 3)

    # df-cap headroom: the hottest shingle bucket on the 50k corpus
    big_df = spark.read.parquet(big)
    exploded = D._exploded_shingle_index(big_df, "text", "doc_id", 3, "fast")
    hot = (
        exploded.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("max_df"))
        .collect()[0]["max_df"]
    )
    print("corpus ratio: 10x")
    for name, t in results.items():
        print(
            f"{name}: 5k={t['5k']}s 50k={t['50k']}s "
            f"ratio={t['50k'] / t['5k']:.1f}x"
        )
    print(f"hottest shingle bucket on 50k corpus: df={hot} (cap=10000)")


if __name__ == "__main__":
    main()
