"""Grouped embedding centroid operator (applyInPandas UDAF surface)."""

import numpy as np

from helix_html2md_spark.operators.centroids import label_centroids


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_centroid_matches_numpy(spark):
    emb = _emb(spark)
    rows = emb.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    out = {r["label"]: r for r in label_centroids(emb).collect()}
    assert set(out) == set(by_label)
    for label, vecs in by_label.items():
        expect = np.round(
            np.stack(vecs).astype(np.float64).mean(axis=0), 6
        )
        got = np.array(out[label]["centroid"])
        assert out[label]["n_vecs"] == len(vecs)
        assert np.allclose(got, expect, atol=1e-9), label


def test_partial_variant_agrees(spark):
    """Map-side-combine twin produces the same centroids (the 100 TB
    path: Arrow-batch partials, JVM zip_with merge)."""
    emb = _emb(spark)
    plain = {r["label"]: r for r in label_centroids(emb).collect()}
    part = {
        r["label"]: r
        for r in label_centroids(emb, partial=True).collect()
    }
    assert set(plain) == set(part)
    for label in plain:
        assert plain[label]["n_vecs"] == part[label]["n_vecs"]
        assert np.allclose(
            plain[label]["centroid"], part[label]["centroid"], atol=2e-6
        ), label


def test_partial_shuffles_partials_not_vectors(spark):
    """The partial variant's exchange carries (label, count, sum) rows:
    the mapInPandas partial sits BELOW the aggregate exchange."""
    plan = (
        label_centroids(_emb(spark), partial=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    x = plan.find("Exchange")
    m = plan.find("MapInPandas")
    assert x >= 0 and m >= 0
    assert m > x  # printed tree: below = later; partials precede shuffle


def test_null_label_is_a_group_in_both_variants(spark):
    """A NULL label forms a null GROUP (SQL GROUP BY semantics) in both
    the plain and partial variants — one null row must not kill the
    stage (int(NaN) / empty-frame Arrow dtype crash)."""
    from helix_html2md_spark.operators.centroids import label_centroids

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (None, [3.0, 4.0]), (1, [3.0, 2.0])],
        "label int, embedding array<double>",
    )
    for partial in (False, True):
        rows = {
            r["label"]: r
            for r in label_centroids(emb, partial=partial).collect()
        }
        assert set(rows) == {1, None}, partial
        assert rows[1]["centroid"] == [2.0, 2.0], partial
        assert rows[None]["centroid"] == [3.0, 4.0], partial


def test_corrupt_embedding_rows_are_excluded_not_fatal(spark):
    """One NULL or ragged-length embedding must degrade itself, not
    abort the stage: np.stack raises on ragged input and a NULL arrives
    as a row-killing None, so both are filtered before the Python
    stage (round-5 review finding)."""
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, None), (2, [9.0]), (2, [3.0, 4.0])],
        "label int, embedding array<double>",
    )
    for partial in (False, True):
        rows = {
            r["label"]: r
            for r in label_centroids(emb, partial=partial).collect()
        }
        assert set(rows) == {1, 2}, partial
        assert rows[1]["centroid"] == [1.0, 2.0], partial
        assert rows[2]["centroid"] == [3.0, 4.0], partial
        assert rows[1]["n_vecs"] == 1 and rows[2]["n_vecs"] == 1


def test_explicit_dim_skips_inference_scan(spark):
    """dim= pins the corpus dimensionality (the 100 TB path): rows of
    any other length are excluded, and no extra aggregate job runs."""
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [5.0, 6.0, 7.0])],
        "label int, embedding array<double>",
    )
    rows = label_centroids(emb, dim=3).collect()
    assert len(rows) == 1
    assert rows[0]["centroid"] == [5.0, 6.0, 7.0]


def test_bigint_labels_survive_both_variants(spark):
    """xxhash64/doc_id-derived labels exceed int32: the output schema
    tracks the INPUT label type instead of pinning `label int`, which
    aborted the whole stage at the Arrow boundary (one corrupt row must
    degrade itself, not the aggregation)."""
    big = 2**31 + 7
    df = spark.createDataFrame(
        [
            (big, [1.0, 3.0]),
            (big, [3.0, 5.0]),
            (5, [2.0, 2.0]),
            (None, [8.0, 8.0]),
        ],
        "label bigint, embedding array<float>",
    )
    for kwargs in ({}, {"partial": True}):
        out = {
            r["label"]: r for r in label_centroids(df, **kwargs).collect()
        }
        assert out[big]["n_vecs"] == 2
        assert list(out[big]["centroid"]) == [2.0, 4.0]
        assert out[5]["n_vecs"] == 1
        assert out[None]["centroid"] == [8.0, 8.0], kwargs
        assert dict(label_centroids(df, **kwargs).dtypes)["label"] == "bigint"


def test_double_labels_pass_through_unmerged(spark):
    """Genuine double labels must NOT be int()-ed (1.2 and 1.5 would
    silently merge into one group)."""
    df = spark.createDataFrame(
        [(1.5, [1.0, 1.0]), (1.2, [3.0, 3.0]), (1.5, [3.0, 5.0])],
        "label double, embedding array<float>",
    )
    for kwargs in ({}, {"partial": True}):
        out = {
            r["label"]: r for r in label_centroids(df, **kwargs).collect()
        }
        assert set(out) == {1.5, 1.2}, kwargs
        assert out[1.5]["n_vecs"] == 2
        assert list(out[1.5]["centroid"]) == [2.0, 3.0]
