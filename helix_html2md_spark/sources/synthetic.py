"""Deterministic synthetic spans corpus (FIXTURES.md §1b).

Documents are assembled from a grammar over the fixture building blocks
(sections, cards/columns blocks, tables, code blocks, lists, image slots)
with a Zipf-ish heavy-tailed size distribution (~1 KB ... 1 MB) to exercise
the skew/repartition path, and 0..N media spans per document.  Everything
derives from (seed, doc index) — no wall clock, no global RNG — so rerolls
and resumed runs produce identical bytes (SURVEY.md §7 R5).

Generation is distributed: ``spark.range(n)`` -> ``mapInPandas`` so the
corpus is built in parallel on executors, never on the driver.
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GEN_VERSION = 2  # bump when gen_doc output changes (invalidates cached corpora)

WORDS = (
    "spark table scan filter join group order sort merge hash batch stream "
    "column row vector query data value key part line customer fast slow "
    "big small the a of and to in is it for with page content site helix"
).split()

# one span-struct DDL, defined in the dependency-free fixtures module
from .fixtures import DOC_SCHEMA as SPAN_SCHEMA


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _media_ref(url: str) -> str:
    h = hashlib.sha1(url.encode()).hexdigest()
    return f"media:1{h}:300x300:image/png"


def gen_doc(seed: int, i: int) -> dict:
    """One synthetic document: interleaved html/media spans."""
    rng = random.Random(f"{seed}:{i}")
    # heavy-tailed size target in bytes (Zipf-ish); cap safely under the
    # 1 MB admission gate so the whole corpus is processable (the gate
    # itself is covered by tests/test_spark_extract.py)
    target = min(int(1024 * rng.paretovariate(1.1)), 900 << 10)
    spans: list[dict] = []
    offset = 0

    def add(kind, text, ref=""):
        nonlocal offset
        spans.append(
            {"kind": kind, "text": text, "media_ref": ref, "offset": offset}
        )
        offset += 1

    buf: list[str] = []
    size = 0

    def emit(s):
        nonlocal size
        buf.append(s)
        size += len(s)

    def flush_html():
        nonlocal buf
        if buf:
            add("html", "".join(buf))
            buf.clear()

    title = _sentence(rng, 4)
    emit(
        "<html><head>"
        f"<title>{title}</title>"
        f'<meta name="description" content="{_sentence(rng, 12)}">'
        f'<meta property="og:title" content="{title}">'
        "</head><body><header></header><main>"
    )
    n_images = 0
    while size < target:
        emit("<div>")
        emit(f"<h2>{_sentence(rng, rng.randint(2, 6))}</h2>")
        for _ in range(rng.randint(1, 6)):
            kind = rng.random()
            if kind < 0.45:
                emit(f"<p>{_sentence(rng, rng.randint(8, 60))}</p>")
            elif kind < 0.6:
                items = "".join(
                    f"<li>{_sentence(rng, rng.randint(2, 8))}</li>"
                    for _ in range(rng.randint(2, 6))
                )
                emit(f"<ul>{items}</ul>")
            elif kind < 0.75:
                cells = "".join(
                    "<div>"
                    + "".join(
                        f"<div><p>{_sentence(rng, rng.randint(3, 15))}</p></div>"
                        for _ in range(3)
                    )
                    + "</div>"
                    for _ in range(rng.randint(1, 4))
                )
                emit(f'<div class="cards">{cells}</div>')
            elif kind < 0.85:
                emit(
                    f'<pre><code class="language-bash">'
                    f"{_sentence(rng, rng.randint(5, 20))}\n"
                    f"{_sentence(rng, rng.randint(5, 20))}\n</code></pre>"
                )
            elif n_images < 50:
                n_images += 1
                url = f"/img/{i}-{n_images}.png"
                emit(f'<picture><img src="{url}" alt="{_sentence(rng, 2)}">')
                flush_html()
                add("media", url, _media_ref(url))
                emit("</picture>")
            else:
                emit(f"<p>{_sentence(rng, 20)}</p>")
        emit("</div>")
    emit("</main><footer></footer></body></html>")
    flush_html()
    return {"doc_id": f"synth:{i:08d}", "spans": spans}


def synthetic_documents(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    # bound peak task memory: an input Arrow batch is up to 10k ids
    # (spark.sql.execution.arrow.maxRecordsPerBatch default) and the
    # Pareto-1.1 doc sizes mean materializing all of them at once holds
    # hundreds of MB of Python dicts + a pandas copy per task; emitting
    # fixed-size chunks keeps the peak at ~chunk * mean_doc regardless
    # of the input batch size, with identical output bytes
    chunk = 256

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            for lo in range(0, len(ids), chunk):
                rows = [
                    gen_doc(seed, int(i)) for i in ids.iloc[lo : lo + chunk]
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": [r["doc_id"] for r in rows],
                        "spans": [
                            [
                                (
                                    s["kind"], s["text"],
                                    s["media_ref"], s["offset"],
                                )
                                for s in r["spans"]
                            ]
                            for r in rows
                        ],
                    }
                )

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=SPAN_SCHEMA)
    )
