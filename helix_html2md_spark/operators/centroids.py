"""Grouped embedding centroids via applyInPandas (vectorized UDAF).

Per-label mean embedding — the building block for topic/cluster
profiling and IVF retraining.  This is the one aggregation in the
engine where the Python grouped path beats the native one: element-wise
mean of an array column in pure Spark SQL needs posexplode ->
groupBy(label, pos) -> avg -> sort + collect_list (two shuffles and a
per-element row explosion of dim x n rows), while applyInPandas does ONE
shuffle on label and a vectorized numpy mean over the Arrow batch.

Scale shape: shuffle key is the label (bounded cardinality); the plain
variant ships every vector to its label's group, and a single label's
vectors must fit one Arrow group.  ``partial=True`` is the 100 TB path:
a mapInPandas pass reduces each Arrow batch to (label, count, sum)
partials BEFORE any shuffle (the classic map-side combine — what
crosses the wire is batches-per-partition x labels rows, not vectors),
then a tiny JVM zip_with fold merges partials per label.  The merge is
DETERMINISTIC: each partial carries its (partition_id, batch_idx) and
the fold runs over an ``array_sort`` of the collected partials, so
float-addition order is fixed across runs (plain np.mean re-orders under
shuffle arrival, so the two variants agree to 6dp on test data rather
than bit-exactly — np.round is also half-even where Spark round is
half-up, a tie-case difference the 6dp round makes vanishingly rare).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# label's type is taken from the INPUT at plan time (see
# label_centroids): pinning `label int` here would abort the whole
# aggregation stage at the Arrow boundary for any bigint label source
# (hash- or doc_id-derived labels overflow int32), violating the
# one-corrupt-row-degrades-itself invariant below
CENTROID_SCHEMA = "label {label_type}, n_vecs bigint, centroid array<double>"


def _clean_label(lab, integral: bool):
    """Undo pandas' NULL-driven widening without assuming a label type:
    for an INTEGRAL input column, int-with-nulls arrives as float64 and
    int() restores the integer the Arrow writer expects; genuine NaN is
    a null GROUP — SQL GROUP BY semantics — not a crash.  For any other
    label type the value passes through untouched (int()-ing a genuine
    double label would silently merge the 1.2 and 1.5 groups, and
    float('inf') would abort the stage on OverflowError)."""
    import numpy as np

    if lab is None or (
        isinstance(lab, (float, np.floating)) and pd.isna(lab)
    ):
        return None
    if integral and isinstance(lab, (float, np.floating)):
        return int(lab)
    return lab


def _centroid_fn(pdf: pd.DataFrame, integral: bool) -> pd.DataFrame:
    import numpy as np

    lab = pdf["label"].iloc[0]
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pd.DataFrame(
        {
            "label": [_clean_label(lab, integral)],
            "n_vecs": [len(pdf)],
            "centroid": [np.round(mat.mean(axis=0), 6).tolist()],
        }
    )


def _partial_batches(
    batches: Iterator[pd.DataFrame], integral: bool
) -> Iterator[pd.DataFrame]:
    import numpy as np
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else 0
    for bi, pdf in enumerate(batches):
        if not len(pdf):
            # an empty frame's empty list-column infers float64 dtype and
            # Arrow conversion dies (NumPyConverter <list<double>>); skip
            continue
        out = {"pid": [], "bi": [], "label": [], "n_vecs": [], "vec_sum": []}
        # dropna=False: NULL labels form a null group (SQL GROUP BY
        # semantics, and the twin the plain variant produces)
        for label, g in pdf.groupby("label", dropna=False):
            mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            out["pid"].append(pid)
            out["bi"].append(bi)
            out["label"].append(_clean_label(label, integral))
            out["n_vecs"].append(len(g))
            out["vec_sum"].append(mat.sum(axis=0).tolist())
        yield pd.DataFrame(out)


def label_centroids(
    emb: DataFrame, *, partial: bool = False, dim: int | None = None
) -> DataFrame:
    """Per-label mean embedding: (label, n_vecs, centroid).

    Rows whose embedding is NULL or whose length differs from the
    corpus dimensionality are EXCLUDED before the Python stage: one
    corrupt row must degrade itself, not abort the whole aggregation
    (``np.stack`` raises on ragged input, and a NULL arrives as a
    row-killing None).  ``dim`` pins the expected dimensionality; when
    omitted it is inferred with one cheap count-per-length aggregate
    (majority length, smaller-length tie-break — deterministic on any
    engine).  Pass ``dim`` explicitly on the 100 TB path to skip the
    inference scan.
    """
    vecs = emb.select("label", "embedding").filter(
        F.col("embedding").isNotNull()
    )
    if dim is None:
        row = (
            vecs.groupBy(F.size("embedding").alias("_d"))
            .count()
            .orderBy(F.desc("count"), "_d")
            .first()
        )
        dim = int(row["_d"]) if row is not None else 0
    vecs = vecs.filter(F.size("embedding") == dim)
    label_type = emb.schema["label"].dataType.simpleString()
    integral = label_type in ("tinyint", "smallint", "int", "bigint")

    # hinted closures, not functools.partial: PySpark infers the UDF
    # eval type from the callable's type hints, which a partial hides
    def _centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        return _centroid_fn(pdf, integral)

    def _partials(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        return _partial_batches(batches, integral)

    if not partial:
        return vecs.groupBy("label").applyInPandas(
            _centroid, CENTROID_SCHEMA.format(label_type=label_type)
        )
    partials = vecs.mapInPandas(
        _partials,
        f"pid int, bi int, label {label_type}, n_vecs bigint, "
        "vec_sum array<double>",
    )
    # array_sort over (pid, bi, ...) structs pins the fold order: the
    # merged sum is bit-identical across runs for a deterministic input
    # partitioning (collect_list alone arrives in shuffle-fetch order)
    merged = partials.groupBy("label").agg(
        F.sum("n_vecs").alias("n_vecs"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("pid", "bi", "vec_sum"))
            ),
            F.expr("array()").cast("array<double>"),
            lambda acc, v: F.when(F.size(acc) == 0, v["vec_sum"]).otherwise(
                F.zip_with(acc, v["vec_sum"], lambda a, b: a + b)
            ),
        ).alias("_sum"),
    )
    return merged.select(
        "label",
        "n_vecs",
        F.transform(
            "_sum", lambda s: F.round(s / F.col("n_vecs"), 6)
        ).alias("centroid"),
    )
