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
docs = spark.read.parquet(path)

if variant == "prod":
    out = extract_documents(docs, None, num_partitions=cores)
else:
    df = prepare_for_extract(docs.select("doc_id", "spans"), {})
    if variant == "hash4":
        df = df.repartition(cores * 4, "doc_id")
    out = df.drop("_html_len").mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)

out.agg(F.count("*")).collect()  # warmup
walls = []
for _ in range(2):
    t0 = time.perf_counter()
    n = out.agg(F.count("*")).collect()[0][0]
    walls.append(time.perf_counter() - t0)
print(f"RESULT cores={cores} variant={variant} wall={min(walls):.3f} docs={n}")
spark.stop()
