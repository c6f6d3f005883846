"""North-rule launch mode: spark-submit --py-files over a zipped package.

Zips helix_html2md_spark, launches jobs/extract_job.py through the real
spark-submit binary on a FRESH JVM (no pytest session reuse), and checks
the job extracts, writes lineage + metrics, and resumes as a no-op.
This is the closest local[2] stand-in for "spark-submit --py-files on a
multi-executor cluster": the package travels as an archive through
Spark's file distribution, exactly as it would to remote executors.
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "engine.zip")
    pkg = os.path.join(ROOT, "helix_html2md_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, ROOT))
    return zpath


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    corpus = str(tmp_path / "docs")
    from helix_html2md_spark.sources.synthetic import synthetic_documents

    synthetic_documents(spark, 24, seed=11, partitions=2).write.parquet(
        corpus
    )
    out = str(tmp_path / "extracted")
    zpath = _zip_package(tmp_path)

    # a bare job script that does NOT sys.path-hack its repo checkout:
    # the package must arrive via --py-files or the import fails
    job = str(tmp_path / "job.py")
    with open(os.path.join(ROOT, "jobs", "extract_job.py")) as f:
        src = f.read()
    src = src.replace(
        "sys.path.insert(\n"
        "    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))\n"
        ")",
        "# package arrives via --py-files",
    )
    with open(job, "w") as f:
        f.write(src)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def run(run_id: str) -> str:
        res = subprocess.run(
            [
                SPARK_SUBMIT, "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", zpath,
                job,
                "--input", corpus, "--output", out, "--run-id", run_id,
                "--num-partitions", "2",
            ],
            capture_output=True, text=True, timeout=420, env=env,
            cwd=str(tmp_path),
        )
        assert res.returncode == 0, res.stderr[-4000:]
        return res.stdout

    stdout = run("submit-r1")
    assert "'docs': 24" in stdout.replace('"', "'")

    result = spark.read.parquet(out)
    assert result.count() == 24
    assert result.filter("status = 'ok'").count() == 24
    lineage = spark.read.parquet(out + "_lineage")
    assert lineage.filter("run_id = 'submit-r1'").count() > 0

    # resume on a fresh JVM: second submit is a no-op (anti-join resume)
    stdout2 = run("submit-r2")
    assert "'docs': 0" in stdout2.replace('"', "'")
    assert spark.read.parquet(out).count() == 24
