"""Semantic dedup (operators/similarity.py::semantic_dedup) and the
multi-iteration Lloyd refinement in train_centroids.

Layers per the repo's oracle discipline: hand-computed expectations on
integer-valued vectors (float sums of small integers are exact in any
addition order, so distributed avg == hand arithmetic), a row-for-row
DuckDB differential at sf0.001 feeding BOTH engines the same collected
centroid literals, and plan-shape assertions (no Python, no nested
loop)."""

from __future__ import annotations

import os

import duckdb
import pytest

from helix_html2md_spark.operators.dedup import release_persisted
from helix_html2md_spark.operators.similarity import (
    semantic_dedup, train_centroids,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_train_centroids_iters_hand(spark):
    # Clusters along +x and +y; seeds are vecs 0 and 1 (one per
    # cluster), and the split is clean under cosine so the integer
    # means are exact in any summation order.
    rows = [
        (0, [4.0, 0.0]),
        (1, [0.0, 4.0]),
        (2, [8.0, 0.0]),
        (3, [0.0, 8.0]),
        (4, [6.0, 0.0]),
        (5, [0.0, 6.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = train_centroids(emb, k=2, iters=1)
    # cells by cosine vs seeds (4,0)/(0,4): A={0,2,4} -> mean (6,0);
    # B={1,3,5} -> mean (0,6).  Integer sums: exact.
    assert one == [[6.0, 0.0], [0.0, 6.0]]
    # a second pass is a fixed point here
    assert train_centroids(emb, k=2, iters=2) == one
    # determinism across builds
    assert train_centroids(emb, k=2, iters=2) == train_centroids(
        emb, k=2, iters=2
    )
    with pytest.raises(ValueError):
        train_centroids(emb, k=2, iters=0)


def test_train_centroids_second_pass_changes_result(spark):
    # A case where the SECOND Lloyd pass reassigns a vector, so
    # iters=2 != iters=1 — an implementation that ignores `iters`
    # cannot pass this.  Seeds = vecs 0/1 = (1,0)/(2,1).
    # Pass 1: v1 IS seed 1 (cos 1), v2/v3=(0,1) prefer (2,1)
    # (cos .447 vs 0) -> cells {0} / {1,2,3}; means (1,0) / (2/3,1).
    # Pass 2 vs (2/3,1): v1=(2,1) now scores cos .894 on centroid 0
    # vs .868 on centroid 1 -> FLIPS to cell 0; means become
    # (1.5,.5) / (0,1) — integer sums, exact.
    rows = [
        (0, [1.0, 0.0]),
        (1, [2.0, 1.0]),
        (2, [0.0, 1.0]),
        (3, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = train_centroids(emb, k=2, iters=1)
    assert one == [[1.0, 0.0], [2.0 / 3.0, 1.0]]
    two = train_centroids(emb, k=2, iters=2)
    assert two == [[1.5, 0.5], [0.0, 1.0]]
    assert one != two


def test_semantic_dedup_hand(spark):
    # cluster +x: 10/11 near-identical (cos 1.0) -> 11 drops;
    # 12 = (8,6) lands in the +x cell (cos .8 vs .6 on the centroids)
    # and IS compared to 10/11, but cos(12,10) = 0.8 < 0.95 -> kept.
    # cluster +y: 20/21 identical -> 21 drops; null embedding kept.
    rows = [
        (10, [10.0, 0.0]),
        (11, [10.0, 0.0]),
        (12, [8.0, 6.0]),
        (20, [0.0, 9.0]),
        (21, [0.0, 9.0]),
        (22, None),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    try:
        out = semantic_dedup(emb, threshold=0.95, centroids=cents)
        assert sorted(r["vec_id"] for r in out.collect()) == [10, 12, 20, 22]
        assert out.columns == emb.columns  # full input rows survive
        # same-cell non-dup is really exercised: at threshold 0.75 the
        # in-cell pair (10,12) now qualifies and 12 drops too
        tight = semantic_dedup(emb, threshold=0.75, centroids=cents)
        assert sorted(r["vec_id"] for r in tight.collect()) == [10, 20, 22]
        # chain policy: a~b~c keeps only the minimum id
        chain = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        kept = semantic_dedup(chain, threshold=0.99, centroids=cents)
        assert [r["vec_id"] for r in kept.collect()] == [1]
        with pytest.raises(ValueError):
            semantic_dedup(emb, threshold=1.5, centroids=cents)
    finally:
        release_persisted()


def _cell_sql(centroids: list[list[float]]) -> str:
    """DuckDB twin of ivf_assign: 6dp-rounded cosine-vs-centroid scores,
    first-max argmax (list_position is 1-based first occurrence)."""
    scores = []
    for c in centroids:
        dot = " + ".join(
            f"cast(embedding[{i + 1}] AS double) * ({v!r})"
            for i, v in enumerate(c)
        )
        nrm = sum(v * v for v in c) ** 0.5 or 1.0
        scores.append(f"round(({dot}) / {nrm!r}, 6)")
    lst = "list_value(" + ", ".join(scores) + ")"
    return f"(list_position({lst}, list_max({lst})) - 1)"


def test_semantic_dedup_vs_duckdb(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cents = train_centroids(emb, k=4, iters=2)
    try:
        got = sorted(
            r["vec_id"]
            for r in semantic_dedup(
                emb, threshold=0.3, centroids=cents, max_cell_size=100000
            ).select("vec_id").collect()
        )
    finally:
        release_persisted()
    con = duckdb.connect()
    cell = _cell_sql(cents)
    exp = [
        r[0]
        for r in con.execute(f"""
        WITH e AS (
          SELECT vec_id, embedding, ({cell}) AS cell
          FROM parquet_scan('{SF_DIR}/embeddings.parquet')
          WHERE embedding IS NOT NULL),
        n AS (
          SELECT vec_id, cell, embedding,
                 sqrt(list_sum(list_transform(embedding,
                      x -> cast(x AS double) * cast(x AS double)))) AS nrm
          FROM e),
        drops AS (
          SELECT DISTINCT greatest(a.vec_id, b.vec_id) AS vec_id
          FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE a.nrm <> 0 AND b.nrm <> 0
            AND round(list_sum(list_transform(
                  list_zip(a.embedding, b.embedding),
                  p -> cast(p[1] AS double) * cast(p[2] AS double)))
                / (a.nrm * b.nrm), 6) >= 0.3)
        SELECT vec_id FROM parquet_scan('{SF_DIR}/embeddings.parquet')
        WHERE vec_id NOT IN (SELECT vec_id FROM drops)
        ORDER BY vec_id
        """).fetchall()
    ]
    assert got == exp
    assert len(got) < emb.count()  # the differential actually dropped rows


def test_semantic_dedup_plan(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cents = train_centroids(emb, k=4)
    try:
        plan = (
            semantic_dedup(emb, threshold=0.9, centroids=cents)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        release_persisted()
    assert "PythonEval" not in plan and "MapInPandas" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
