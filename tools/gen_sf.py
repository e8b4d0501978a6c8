"""Deterministic sf1 (or any multiple-of-sf0.1) dataset generator.

The driver ships read-only parquet at sf0.001/0.01/0.1; the 100 TB brief
wants bench evidence one notch further up.  This generates a
distribution-preserving K× upsample of sf0.1 (default K=10 ≈ sf1) under a
LOCAL cache dir (``/root/repo/.data/sf{K/10}`` — /root/testdata is
read-only), so ``bench.py --sf 1`` can run the same headline queries at 10×
and BENCH.md can record the scaling ratios.

Per-table strategy (seed-pinned, idempotent — skips tables already present):

- ``region``/``nation``: copied verbatim (fixed-size dimensions in TPC-H —
  scale factor never grows them).
- ``customer``/``supplier``/``part``/``orders``/``lineitem``/``events``:
  K self-contained replicas with key-translated surrogate AND foreign keys
  (replica i adds ``i * key_range`` to every key).  Join selectivities,
  group cardinalities on dimension attributes, and value distributions are
  preserved EXACTLY; per-group counts scale by K — the standard replicate-
  with-key-translation scale-up.
- ``documents``: the sf0.1 corpus plus (K-1)×5k synthesized documents with
  word frequencies, document lengths, paragraph structure, and
  (lang, source) pairs sampled from the real corpus (same recipe as
  tools/soak_dedup.py), plus ~2% near-duplicates (copy + one-token edit) so
  the near-dup operators keep realistic positive pairs.  Exact replication
  would be wrong here: 10 identical copies of every doc turns the dedup
  benches into a pathological all-duplicates corpus.
- ``embeddings``: originals plus perturbed copies (Gaussian noise at 2% of
  the vector norm, renormalized to preserve the norm distribution), labels
  kept, ids offset.

Usage: python tools/gen_sf.py [--mult 10] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", "sf1"
)

# (table, [key columns to translate], [fk -> referenced table key-range])
_REPLICATED = {
    "customer": {"keys": ["c_custkey"]},
    "supplier": {"keys": ["s_suppkey"]},
    "part": {"keys": ["p_partkey"]},
    "orders": {"keys": ["o_orderkey"], "fks": {"o_custkey": "customer.c_custkey"}},
    "lineitem": {
        "keys": [],
        "fks": {
            "l_orderkey": "orders.o_orderkey",
            "l_partkey": "part.p_partkey",
            "l_suppkey": "supplier.s_suppkey",
        },
    },
    "events": {"keys": ["event_id"], "fks": {"user_id": "events.user_id"}},
}


def _key_range(con, table: str, col: str) -> int:
    lo, hi = con.execute(
        f"SELECT MIN({col}), MAX({col}) FROM '{SRC}/{table}.parquet'"
    ).fetchone()
    return int(hi) - int(lo) + 1


def gen_replicated(con, out_dir: str, mult: int) -> None:
    for table, spec in _REPLICATED.items():
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
            ).fetchall()
        ]
        shifts: dict[str, int] = {}
        for k in spec.get("keys", []):
            shifts[k] = _key_range(con, table, k)
        for fk, ref in spec.get("fks", {}).items():
            rt, rc = ref.split(".")
            shifts[fk] = _key_range(con, rt, rc)
        select = ", ".join(
            f"{c} + i * {shifts[c]} AS {c}" if c in shifts else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} FROM '{SRC}/{table}.parquet', "
            f"range({mult}) t(i) ORDER BY i) TO '{dst}' (FORMAT PARQUET)"
        )
        print(f"{table}: x{mult} replicated -> {dst}")


def gen_copied(con, out_dir: str) -> None:
    for table in ("region", "nation"):
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO '{dst}' "
            "(FORMAT PARQUET)"
        )
        print(f"{table}: copied (fixed-size dimension)")


def gen_documents(con, out_dir: str, mult: int, seed: int = 20260814) -> None:
    dst = f"{out_dir}/documents.parquet"
    if os.path.exists(dst):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = con.execute(f"SELECT * FROM '{SRC}/documents.parquet'").arrow()
    n_base = base.num_rows
    n_new = n_base * (mult - 1)

    words = con.execute(
        f"SELECT unnest(string_split(text, ' ')) AS w FROM "
        f"'{SRC}/documents.parquet'"
    ).df()["w"]
    counts = words.value_counts()
    vocab = counts.index.to_numpy()
    probs = (counts / counts.sum()).to_numpy()
    lens = con.execute(
        f"SELECT len(string_split(text, ' ')) AS n FROM "
        f"'{SRC}/documents.parquet'"
    ).df()["n"].to_numpy()
    pairs = con.execute(
        f"SELECT lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()

    rng = np.random.RandomState(seed)
    doc_lens = rng.choice(lens, size=n_new)
    pair_idx = rng.randint(0, len(pairs), size=n_new)
    texts: list[str] = []
    for n in doc_lens:
        toks = rng.choice(vocab, size=int(n), p=probs)
        # newline every ~12 words: paragraph structure for d07/c01-style ops
        texts.append(
            "\n".join(
                " ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)
            )
        )
    # ~2% near-duplicates (copy + one-token edit) so near-dup operators keep
    # realistic positives at scale
    n_dups = n_new // 50
    dup_src = rng.randint(0, n_new - n_dups, size=n_dups)
    for k, s in enumerate(dup_src):
        t = texts[int(s)].split(" ")
        t[rng.randint(0, len(t))] = str(rng.choice(vocab))
        texts[n_new - n_dups + k] = " ".join(t)

    new_tbl = pa.table(
        {
            "doc_id": pa.array(
                range(n_base, n_base + n_new), type=pa.int64()
            ),
            "text": pa.array(texts),
            "lang": pa.array([pairs[i][0] for i in pair_idx]),
            "source": pa.array([pairs[i][1] for i in pair_idx]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(
        pa.concat_tables([base.select(new_tbl.column_names), new_tbl]), dst
    )
    print(f"documents: {n_base} real + {n_new} synthesized -> {dst}")


def gen_embeddings(con, out_dir: str, mult: int, seed: int = 20260815) -> None:
    dst = f"{out_dir}/embeddings.parquet"
    if os.path.exists(dst):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = con.execute(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
    vecs = np.stack(df["embedding"].to_numpy())
    labels = df["label"].to_numpy()
    n, dim = vecs.shape
    rng = np.random.RandomState(seed)
    out_vecs = [vecs]
    out_labels = [labels]
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    dim_scale = np.sqrt(dim)
    for i in range(1, mult):
        # per-component sigma 0.02*norm/sqrt(dim) so the expected NOISE
        # VECTOR length is ~2% of the embedding norm (plain 0.02*norm per
        # component would be 0.02*sqrt(dim) ≈ 16% directionally — review r5)
        noise = rng.normal(0.0, 0.02, size=vecs.shape).astype(np.float32)
        v = vecs + noise * norms / dim_scale  # ~2% relative perturbation
        # renormalize to the ORIGINAL norms so the norm distribution (which
        # cosine/IVF ops depend on) is preserved exactly
        v = v / np.linalg.norm(v, axis=1, keepdims=True) * norms
        out_vecs.append(v.astype(np.float32))
        out_labels.append(labels)
    all_vecs = np.concatenate(out_vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n * mult), type=pa.int64()),
            "embedding": pa.array(
                [v for v in all_vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                np.concatenate(out_labels), type=pa.int32()
            ),
        }
    )
    pq.write_table(tbl, dst)
    print(f"embeddings: {n} real + {n * (mult - 1)} perturbed -> {dst}")


def ensure_dataset(out_dir: str = DEFAULT_OUT, mult: int = 10) -> str:
    """Generate any missing tables; returns the dataset dir (idempotent)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    gen_copied(con, out_dir)
    gen_replicated(con, out_dir, mult)
    gen_documents(con, out_dir, mult)
    gen_embeddings(con, out_dir, mult)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10, help="multiple of sf0.1")
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()
    ensure_dataset(args.out, args.mult)


if __name__ == "__main__":
    main()
