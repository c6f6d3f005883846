"""Alternating-visit extraction A/B at a chosen corpus size.

Usage: python scratch/ab_extract.py <repo_root> <n_docs> [n_runs]

Child-process entry: runs bench.py's exact extraction methodology
(warmup + min-of-N salted runs, local[$SPARK_GRAFT_CPUS]) against the
shared deterministic corpus, with the library imported from
<repo_root>.  Prints one JSON line {"wall": ..., "docs_per_sec": ...}.
The parent (an interactive session) alternates repo roots so both
sides of the comparison see the same host weather.
"""

import json
import os
import sys
import time

root = sys.argv[1]
n_docs = int(sys.argv[2])
n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sys.path.insert(0, root)
# the PYTHON WORKERS build sys.path from PYTHONPATH + cwd, NOT from the
# driver's sys.path — without this the workers silently import whatever
# library the cwd holds and the A/B compares a tree against itself
os.environ["PYTHONPATH"] = root + os.pathsep + os.environ.get("PYTHONPATH", "")
os.chdir("/")  # keep the cwd's library out of the workers' sys.path

from helix_html2md_spark.session import build_session  # noqa: E402
from helix_html2md_spark.sources.synthetic import (  # noqa: E402
    GEN_VERSION, synthetic_documents,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
path = f"/tmp/spark_graft_corpus_v{GEN_VERSION}_ab{n_docs}"

spark = build_session(
    "ab-extract", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
)
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    synthetic_documents(spark, n_docs, seed=42).write.mode(
        "overwrite"
    ).parquet(path)

from pyspark.sql import functions as F  # noqa: E402

from helix_html2md_spark.operators.extract import extract_documents  # noqa: E402

salt = [0]


def run_once() -> float:
    salt[0] += 1
    docs = spark.read.parquet(path).filter(
        F.col("doc_id") != f"@ab-salt-{os.getpid()}-{salt[0]}"
    )
    t0 = time.perf_counter()
    extract_documents(docs, None).agg(
        F.count("*"), F.sum(F.when(F.col("status") == "ok", 1).otherwise(0))
    ).collect()
    return time.perf_counter() - t0


# prove the WORKERS run the tree under test before timing anything
def _probe(batches):
    import helix_html2md_spark as h

    import pandas as pd
    for b in batches:
        yield pd.DataFrame({"f": [h.__file__] * len(b)})


wf = spark.range(1).toDF("x").mapInPandas(_probe, schema="f string").collect()
assert wf[0]["f"].startswith(root), f"workers import {wf[0]['f']}, not {root}"

run_once()  # warmup
walls = [run_once() for _ in range(n_runs)]
best = min(walls)
print(json.dumps({
    "root": root, "n_docs": n_docs, "walls": [round(w, 3) for w in walls],
    "wall": round(best, 3), "docs_per_sec": round(n_docs / best, 1),
}))
spark.stop()
