"""Trained-artifact persistence: models and index parameters as parquet.

Every learned artifact in this repo is small (classifier weights ≤ a few MB,
IVF centroids and PQ codebooks a few KB) but EXPENSIVE to recompute at corpus
scale — the operational pattern is train once on a bounded sample, persist,
then score/search any number of corpora with the frozen artifact.  Parquet is
the storage format so the artifacts live next to the data on the same object
store, survive engine restarts, and are readable by any engine (the same
argument as the open-spec ``_delta_log`` in ``sources/delta_writer.py``).

Layout: one parquet directory per artifact with rows
``(name, idx0, idx1, vec: array<double>)`` — 1D arrays store as a single
row's ``vec``, 2D as one row per leading index, 3D (PQ codebooks) as one row
per (idx0, idx1) — plus a ``_shape:<name>`` row whose vector carries the
array's dimensions.  Save/load round-trips are exact (float64 end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import BuzzBadRequestError
from .classifier import TextClassifierModel

_SCHEMA = "name STRING, idx0 INT, idx1 INT, vec ARRAY<DOUBLE>"


def save_arrays(spark: SparkSession, path: str, arrays: dict) -> None:
    """Persist a dict of 1-3D float numpy arrays to one parquet directory."""
    import numpy as np

    rows = []
    for name, arr in arrays.items():
        a = np.asarray(arr, dtype=np.float64)
        if a.ndim == 1:
            rows.append((name, 0, 0, a.tolist()))
        elif a.ndim == 2:
            rows += [(name, i, 0, a[i].tolist()) for i in range(a.shape[0])]
        elif a.ndim == 3:
            rows += [
                (name, i, j, a[i, j].tolist())
                for i in range(a.shape[0])
                for j in range(a.shape[1])
            ]
        else:
            raise BuzzBadRequestError(
                f"array {name!r} has unsupported ndim {a.ndim} (must be 1-3)"
            )
        rows.append((f"_shape:{name}", 0, 0, [float(d) for d in a.shape]))
    spark.createDataFrame(rows, _SCHEMA).repartition(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_arrays(spark: SparkSession, path: str) -> dict:
    """Load a :func:`save_arrays` directory back into {name: ndarray}."""
    import numpy as np

    rows = spark.read.parquet(path).collect()
    shapes = {}
    data: dict[str, dict] = {}
    for r in rows:
        if r["name"].startswith("_shape:"):
            shapes[r["name"][len("_shape:"):]] = tuple(int(d) for d in r["vec"])
        else:
            data.setdefault(r["name"], {})[(r["idx0"], r["idx1"])] = r["vec"]
    out = {}
    for name, shape in shapes.items():
        cells = data.get(name, {})
        arr = np.zeros(shape, dtype=np.float64)
        if len(shape) == 1:
            arr[:] = cells[(0, 0)]
        elif len(shape) == 2:
            for (i, _), vec in cells.items():
                arr[i] = vec
        else:
            for (i, j), vec in cells.items():
                arr[i, j] = vec
        out[name] = arr
    return out


def save_classifier(
    spark: SparkSession, model: TextClassifierModel, path: str
) -> None:
    """Persist a trained text classifier (nonzero weights + metadata)."""
    import numpy as np

    nz = np.flatnonzero(model.weights)
    save_arrays(
        spark,
        path,
        {
            "weight_idx": nz.astype(np.float64),
            "weight_val": model.weights[nz],
            "meta": np.array(
                [float(model.dim), model.bias, 1.0 if model.bigrams else 0.0,
                 float(model.iters_run)]
            ),
            "losses": np.asarray(model.losses, dtype=np.float64),
        },
    )


def load_classifier(spark: SparkSession, path: str) -> TextClassifierModel:
    """Load a :func:`save_classifier` artifact; scores are bit-identical to
    the in-memory model's (float64 round-trip is exact)."""
    import numpy as np

    arrs = load_arrays(spark, path)
    try:
        meta = arrs["meta"]
        dim = int(meta[0])
        w = np.zeros(dim, dtype=np.float64)
        idx = arrs["weight_idx"].astype(np.int64)
        w[idx] = arrs["weight_val"]
    except KeyError as e:
        raise BuzzBadRequestError(f"not a classifier artifact: {path!r} ({e})")
    return TextClassifierModel(
        dim=dim,
        bias=float(meta[1]),
        weights=w,
        bigrams=bool(meta[2]),
        iters_run=int(meta[3]),
        losses=list(arrs.get("losses", np.empty(0))),
    )
