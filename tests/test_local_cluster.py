"""Multi-JVM smoke: the extraction pipeline and the exact prefix-sum
packing must produce byte-identical results on a REAL multi-executor
master (``local-cluster[2,2,1024]`` — two separate worker JVMs with
their own Python workers, real cross-process shuffles, real broadcast
distribution), not just threaded ``local[N]``.

This is the closest sandbox evidence for the north rule's
multi-executor claim that local mode cannot give: closure
serialization to foreign JVMs, Python-worker launch on executors
(PYTHONPATH via executorEnv), and shuffle exchange over the block
manager all actually happen here.

Runs in a SUBPROCESS: pytest's session fixture owns the in-process
SparkContext, and two contexts cannot coexist.
"""

import json
import os
import subprocess
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import json
import sys

from pyspark.sql import functions as F

from helix_html2md_spark.session import build_session

spark = build_session(
    "local-cluster-smoke",
    master="local-cluster[2,2,1024]",
    shuffle_partitions=4,
    extra_conf={"spark.executorEnv.PYTHONPATH": @ROOT@},
)
from helix_html2md_spark.operators.extract import extract_documents
from helix_html2md_spark.sources.fixtures import fixture_documents

docs, cfg = fixture_documents(spark)
out = extract_documents(docs, cfg, num_partitions=4)
rows = out.select(
    "doc_id", "status", F.md5(F.col("md")).alias("md_md5")
).collect()

from helix_html2md_spark.operators.dedup import release_persisted
from helix_html2md_spark.operators.packing import pack_sequences

pdocs = spark.createDataFrame(
    [(f"d{i:03d}", " ".join(["tok"] * (i % 7 + 1))) for i in range(40)],
    "doc_id string, text string",
)
packs = {
    r["doc_id"]: [r["n_tokens"], r["pack_id"], r["offset_in_pack"]]
    for r in pack_sequences(pdocs, seq_len=16).collect()
}
release_persisted()
# read AFTER the jobs: workers register with the driver asynchronously,
# so an immediate post-build read sees only the driver entry
n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
spark.stop()
print("RESULT:" + json.dumps({
    "n_exec": n_exec,
    "extract": {r["doc_id"]: [r["status"], r["md_md5"]] for r in rows},
    "packs": packs,
}))
"""


def test_local_cluster_matches_goldens(tmp_path):
    pp = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ,
        PYTHONPATH=ROOT + (os.pathsep + pp if pp else ""),
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@ROOT@", repr(ROOT))],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # never inherit the repo cwd by accident
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    res = json.loads(line[-1][len("RESULT:"):])

    # really multi-JVM: 2 workers + the driver's own entry
    assert res["n_exec"] >= 3, res["n_exec"]

    # extraction across foreign executors == the repo-shipped golden
    # parquet (itself bound to the reference fixture files)
    golden = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            "SELECT doc_id, status, md_md5 FROM "
            f"read_parquet('{ROOT}/data/golden_extract.parquet/*.parquet')"
        ).fetchall()
    }
    got = {k: tuple(v) for k, v in res["extract"].items()}
    assert len(got) == 27
    for doc_id, (status, md_md5) in golden.items():
        assert got[doc_id][0] == status, doc_id
        if status == "ok":
            assert got[doc_id][1] == md_md5, doc_id

    # exact two-phase prefix sum across real shuffle exchanges: offsets
    # are partition-count- and executor-placement-independent integers
    expected, acc = {}, 0
    for i in range(40):
        n = i % 7 + 1
        expected[f"d{i:03d}"] = [n, acc // 16, acc % 16]
        acc += n
    assert {k: list(v) for k, v in res["packs"].items()} == expected
