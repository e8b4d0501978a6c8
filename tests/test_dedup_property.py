"""Property tests: the dedup family must agree with brute-force Python
oracles on hypothesis-generated corpora (small vocabularies force heavy
duplication, newlines force multi-paragraph documents)."""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from buzz_rust_spark.operators import dedup as D

WORDS = ["alpha", "beta", "gamma", "delta", "twelve", "chars", "run"]


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower().strip())


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 12))
    docs = []
    for i in range(n_docs):
        n_paras = draw(st.integers(1, 4))
        paras = [
            " ".join(
                draw(
                    st.lists(st.sampled_from(WORDS), min_size=0, max_size=5)
                )
            )
            for _ in range(n_paras)
        ]
        docs.append((i, "\n".join(paras)))
    return docs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus())
def test_paragraph_dedup_matches_bruteforce(spark_session_holder, docs):
    spark = spark_session_holder
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_paragraphs"], r["n_kept"])
        for r in D.paragraph_dedup(df, min_chars=10).collect()
    }

    # brute force: first (doc_id, pos) occurrence per normalized paragraph
    seen: dict[str, tuple[int, int]] = {}
    for doc_id, text in sorted(docs):
        for pos, para in enumerate(text.split("\n")):
            if len(para.strip()) >= 10:
                seen.setdefault(_norm(para), (doc_id, pos))
    for doc_id, text in docs:
        paras = text.split("\n")
        kept = [
            p
            for pos, p in enumerate(paras)
            if len(p.strip()) < 10 or seen[_norm(p)] == (doc_id, pos)
        ]
        assert got[doc_id] == ("\n".join(kept), len(paras), len(kept)), (
            doc_id,
            text,
        )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus())
def test_incremental_dedup_matches_bruteforce(spark_session_holder, docs):
    spark = spark_session_holder
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    seen_df = D.exact_duplicates(
        df.where(df.doc_id % 2 == 0)
    ).select("text_hash")
    got = {
        (r["doc_id"], r["text_hash"])
        for r in D.dedup_incremental(
            df.where(df.doc_id % 2 == 1), seen_df
        ).select("doc_id", "text_hash").collect()
    }

    def h(text: str) -> str:
        return hashlib.md5(_norm(text).encode()).hexdigest()

    seen = {h(t) for i, t in docs if i % 2 == 0}
    best: dict[str, int] = {}
    for i, t in docs:
        if i % 2 == 1 and h(t) not in seen:
            best[h(t)] = min(best.get(h(t), i), i)
    want = {(i, hh) for hh, i in best.items()}
    assert got == want


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis forbids function-scoped fixtures with @given; the shared
    # session is module-scoped state, which is exactly what we want here
    return spark


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus())
def test_ngram_jaccard_matches_bruteforce(spark_session_holder, docs):
    """ngram_jaccard_pairs (inverted-index + df-cap machinery) must equal the
    definitional all-pairs Jaccard over distinct word 3-grams."""
    spark = spark_session_holder
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_1"], r["id_2"]): round(r["jaccard"], 6)
        for r in D.ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
    }

    def shingles(text: str) -> set[str]:
        toks = _norm(text).split(" ") if _norm(text) else []
        if not toks:
            toks = []
        if len(toks) <= 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    items = sorted(docs)
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            a, b = shingles(items[i][1]), shingles(items[j][1])
            jac = len(a & b) / len(a | b)
            if jac >= 0.3:
                want[(items[i][0], items[j][0])] = round(jac, 6)
    assert got == want


@st.composite
def span_corpus(draw):
    """Tiny vocab + short docs around the span boundary so repeats are
    common and the under-window edge is hit."""
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        n_toks = draw(st.integers(0, 12))
        toks = [draw(st.sampled_from(WORDS[:3])) for _ in range(n_toks)]
        docs.append((i, " ".join(toks)))
    return docs


def _brute_scrub(docs: list[tuple[int, str]], span: int) -> dict[int, str]:
    """Reference implementation: global first occurrence per repeated span
    survives; all other occurrences' ranges are cut (union)."""
    toks = {i: _norm(t).split(" ") if _norm(t) else [] for i, t in docs}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - span + 1):
            occ.setdefault(tuple(ts[p : p + span]), []).append((i, p))
    cuts: dict[int, set[int]] = {i: set() for i in toks}
    for positions in occ.values():
        if len(positions) < 2:
            continue
        for d, p in positions[1:]:  # positions are in (doc, pos) order
            cuts[d].update(range(p, p + span))
    return {
        i: " ".join(t for j, t in enumerate(ts) if j not in cuts[i])
        for i, ts in toks.items()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(span_corpus())
def test_scrub_repeated_spans_matches_bruteforce(spark_session_holder, docs):
    spark = spark_session_holder
    span = 3
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text"]
        for r in D.scrub_repeated_spans(df, span=span).collect()
    }
    assert got == _brute_scrub(docs, span)
