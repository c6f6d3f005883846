"""The repo-shipped golden parquet (data/golden_extract.parquet — the
driver oracle for extract_spans / stream_extract) must be independently
derivable from the REFERENCE fixture files: for every golden .md pair,
the stored md_md5 equals md5 of the reference markdown (trimmed, as the
reference harness compares it — test/index.test.js:130-135).  This binds
the oracle to /root/reference, not to the repo's own pipeline."""

import glob
import hashlib
from pathlib import Path

import duckdb

FIX = Path("/root/reference/test/fixtures")
GOLDEN = sorted(
    glob.glob("/root/repo/data/golden_extract.parquet/*.parquet")
)


def test_golden_md5s_match_reference_files():
    rows = duckdb.sql(
        f"SELECT doc_id, status, md_md5 FROM read_parquet({GOLDEN!r})"
    ).fetchall()
    by_id = {r[0]: r for r in rows}
    md_files = sorted(FIX.glob("*.md"))
    assert len(md_files) == 24
    checked = 0
    for p in md_files:
        doc_id = f"fixture:{p.stem}"
        assert doc_id in by_id, doc_id
        _, status, md_md5 = by_id[doc_id]
        assert status == "ok", doc_id
        expected = hashlib.md5(
            p.read_text().strip().encode()
        ).hexdigest()
        assert md_md5 == expected, doc_id
        checked += 1
    assert checked == 24
    # the 3 error-only fixtures are present as constraint errors
    errors = [r for r in rows if r[1] != "ok"]
    assert len(errors) == 3 and len(rows) == 27
