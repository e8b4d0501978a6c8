"""End-to-end training-corpus preparation demo.

Runs the composed pipeline over the sf0.001 documents table with every
optional stage enabled, printing per-stage survivor counts:

    python examples/corpus_prep_demo.py [sf_dir]

Stages: PII scrub → C4 line cleaning → quality score → Gopher rule gate →
exact dedup → MinHash-LSH near-dup clusters → exact-substring span scrub →
train/val/test split.  See ``buzz_rust_spark/operators/corpus.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from buzz_rust_spark.operators.corpus import CorpusPrepConfig, prepare_training_corpus
from buzz_rust_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-prep-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"input documents: {n0}")

    out = prepare_training_corpus(
        docs,
        config=CorpusPrepConfig(
            min_quality=0.3,
            neardup_threshold=0.8,
            split_weights={"train": 98.0, "val": 1.0, "test": 1.0},
            c4_rules={
                "min_words_per_line": 10,
                "require_terminal_punct": False,  # corpus has no punctuation
                "min_kept_lines": 1,
            },
            gopher_rules={"min_words": 20, "min_stopwords": 0},
            scrub_span=10,
        ),
    )
    out = out.persist()
    n1 = out.count()
    print(f"survivors: {n1} ({n1 / n0:.1%})")
    print("split sizes:")
    for row in out.groupBy("split").count().orderBy("split").collect():
        print(f"  {row['split']}: {row['count']}")
    print("sample:")
    out.select("doc_id", "split", "quality", F.substring("text", 1, 60).alias("text"))\
        .orderBy("doc_id").show(5, truncate=False)
    out.unpersist()


if __name__ == "__main__":
    main()
