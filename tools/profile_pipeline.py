"""Per-stage timing of the pipeline at a given core count."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.ui.enabled", "false")
    .appName(f"profile-{cpus}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from ocr_redaction_engine_spark.operators.classify import classify_pages
from ocr_redaction_engine_spark.operators.explode import explode_spans, route_spans
from ocr_redaction_engine_spark.operators.extract import extract_fields, rejected_unknown_pages
from ocr_redaction_engine_spark.operators.redactions import build_redactions
from ocr_redaction_engine_spark.operators.reassemble import reassemble_flat
from ocr_redaction_engine_spark.operators.tokenize import tokenize_fixture
from ocr_redaction_engine_spark.banks import UNKNOWN_TYPE

D = "/tmp/orx_bench_corpus"
documents = spark.read.parquet(f"{D}/documents")
media_pages = spark.read.parquet(f"{D}/media_pages")
documents.count(); media_pages.count()


def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:28s} {time.time()-t0:7.2f}s")


spans = explode_spans(documents)
text_spans, media_spans = route_spans(spans)
t("explode+route", media_spans)
pages = tokenize_fixture(media_spans, media_pages)
t("tokenize join", pages)
cls = classify_pages(pages)
t("classify", cls)
known = cls.filter(F.col("doc_type") != UNKNOWN_TYPE)
unknown = cls.filter(F.col("doc_type") == UNKNOWN_TYPE)
ext = extract_fields(known, 1)
t("extract (arrow)", ext)
extracted = ext.unionByName(rejected_unknown_pages(unknown))
t("redactions full", build_redactions(extracted))
t("spans reassemble", reassemble_flat(text_spans, media_spans))
spark.stop()
