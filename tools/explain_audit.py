"""Physical-plan audit: for every headline query, inspect the formatted plan
for the scale-critical properties SURVEY.md §4 calls out:

- parquet scans carry PushedFilters / a pruned ReadSchema (pushdown works)
- small-dimension joins are broadcast (no shuffle of the big side)
- WholeStageCodegen covers the relational operators (JVM-side execution;
  ArrowEvalPython nodes are expected only in the pandas-UDF operators)
- no CartesianProduct / BroadcastNestedLoopJoin sneaks in

Usage: python tools/explain_audit.py [query ...]   (default: headline set)
Prints one summary line per query plus any WARNINGs; exits 1 on warnings.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from buzz_rust_spark.queries import all_queries
from buzz_rust_spark.session import get_spark

# Queries where a Python (Arrow) boundary node — ArrowEvalPython (pandas
# UDF), MapInPandas, or FlatMapGroupsInPandas (applyInPandas) — is the
# documented design choice.
PANDAS_UDF_OK = {
    "z01_simhash",
    "z06_ann_ivf",
    "z00_media_features",
    "z02_frame_sample",
    "z03_resize",
    "z07_pq_search",  # pq_encode + ADC scan are the documented vectorized kernels
    "z08_sequence_packing",  # FFD bin packing is the documented applyInPandas kernel
    "z12_semantic_dedup",  # centroid assignment UDF + per-cell greedy BLAS applyInPandas
    "z13_bpe_tokenize",  # BPE encode is the documented Arrow-batched kernel
    "d05_embedding_neardup",  # blocked-BLAS applyInPandas kernel
    "s01_ann_bruteforce",  # partial-top-k BLAS mapInPandas kernel
    "q26_registered_udf",  # the point of the query is the registered pandas UDF
    "z18_warc_pipeline",  # WARC record split + HTTP unwrap is the mapInPandas kernel
    "z19_gif_frames",  # GIF LZW frame decode is the mapInPandas codec kernel
    "z20_webdataset_samples",  # tar member split + PNG decode are mapInPandas kernels
    "z21_quality_classifier",  # training gradient kernel; SERVING is pure JVM
    "z22_video_frames",  # AVI/MJPEG frame decode is the mapInPandas codec kernel
    "z23_audio_features",  # WAV/FLAC decode is the mapInPandas codec kernel
    "z24_media_probe",  # header-only probing is the mapInPandas kernel
    "z25_avro_source",  # OCF block decode is the mapInPandas kernel
}
PY_NODES = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
# q37 compares each group against a one-row global-total threshold: a BNLJ
# whose broadcast side is literally one row is the correct scalar-subquery
# plan (no key exists to hash on).  (s01 formerly allowed a BNLJ for the
# broadcast query side; its partial-top-k mapInPandas shape has no join at
# all, so a reappearing BNLJ is now a regression.)
BNLJ_OK = {"q37_nation_value_share"}
# Fact-to-fact joins where neither side is broadcastable at scale: the Q21
# shape (q44, folded into the suite) anti-joins lineitem against the
# late-lineitems subset — both grow with the corpus, so SortMergeJoin IS the
# 100 TB-correct strategy (broadcast would OOM at scale).
SMJ_OK = {"q27_shape_suite"}


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit(name: str, plan: str) -> list[str]:
    warnings = []
    if "CartesianProduct" in plan:
        warnings.append("CartesianProduct in plan")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
        warnings.append("BroadcastNestedLoopJoin in plan")
    if any(n in plan for n in PY_NODES) and name not in PANDAS_UDF_OK:
        warnings.append("unexpected Python eval node (should be JVM-side)")
    # every SortMergeJoin whose one side is a tiny table is a missed broadcast;
    # we can't see sizes here, so just surface the join strategies chosen
    return warnings


def main() -> int:
    only = set(sys.argv[1:])
    qs = {
        n: q
        for n, q in sorted(all_queries().items())
        if (n in only) or (not only and q.headline)
    }
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    bad = 0
    for name, q in qs.items():
        plan = formatted_plan(q.fn(spark, sf_dir))
        scans = len(re.findall(r"Scan parquet", plan))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        # NOTE: codegen ids only materialize in an AQE plan after execution,
        # so this audit checks plan *shape*; count Python boundaries instead.
        pynodes = sum(plan.count(n) for n in PY_NODES)
        warnings = audit(name, plan)
        flag = " !!" if warnings else ""
        print(
            f"{name:26s} scans={scans} pushedFilterScans={pushed} "
            f"bhj={bhj} smj={smj} pyNodes={pynodes}{flag}"
        )
        for w in warnings:
            bad += 1
            print(f"    WARNING: {w}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
