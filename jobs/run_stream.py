"""spark-submit entry point for the streaming (availableNow) pipeline.

Drains everything currently in the documents directory through the redaction
pipeline as native Structured Streaming queries, then exits; re-running picks
up only new files (the reference's 5 s poll loop, with exactly-once progress).

    spark-submit --py-files dist/ocr_redaction_engine_spark.zip \
        jobs/run_stream.py --documents ... --media-pages ... --out ... --checkpoint ...
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from ocr_redaction_engine_spark.streaming import stream_pipeline


def main():
    ap = argparse.ArgumentParser(description="OCR redaction streaming pipeline")
    ap.add_argument("--documents", required=True)
    ap.add_argument("--media-pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--level", type=int, default=1, choices=(0, 1))
    args = ap.parse_args()

    spark = SparkSession.builder.appName("ocrr-redaction-stream").getOrCreate()
    stream_pipeline(spark, args.documents, args.media_pages,
                    args.out, args.checkpoint, level=args.level)


if __name__ == "__main__":
    main()
