"""Measure extraction wall at a given core count / variant (fresh process)."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from helix_html2md_spark.operators.extract import (
    EXTRACTED_SCHEMA, _extract_batches, extract_documents, prepare_for_extract,
)
from helix_html2md_spark.session import build_session

cores = int(sys.argv[1])
variant = sys.argv[2]  # prod | hash4 | none
path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_corpus_sf0.1"

spark = build_session("scal", master=f"local[{cores}]", shuffle_partitions=cores)


def build(i):
    # salt BELOW the python stage so no cached stage can be reused
    docs = spark.read.parquet(path).filter(F.col("doc_id") != f"@salt-{i}")
    if variant == "prod":
        return extract_documents(docs, None, num_partitions=cores)
    df = prepare_for_extract(docs.select("doc_id", "spans"), {})
    if variant == "hash4":
        df = df.repartition(cores * 4, "doc_id")
    if variant == "none-bytebal":
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    return df.drop("_html_len").mapInPandas(
        _extract_batches, schema=EXTRACTED_SCHEMA
    )


walls = []
for i in range(3):  # first run is warmup
    out = build(i)
    t0 = time.perf_counter()
    n = out.agg(F.count("*")).collect()[0][0]
    w = time.perf_counter() - t0
    if i:
        walls.append(w)
print(f"RESULT cores={cores} variant={variant} wall={min(walls):.3f} docs={n}")
spark.stop()
