"""P1 INVALID_DOCUMENT validity route (operators/validate.py) vs the
pure-Python oracle, and its doc-level exclusion guarantee through the full
pipeline. Reference semantics:
in_progress/process_in_progress_status.py:62-84,123-131."""

from pyspark.sql import functions as F

from ocr_redaction_engine_spark import corpus, oracle
from ocr_redaction_engine_spark.operators.validate import (
    invalid_documents, validity_route)
from ocr_redaction_engine_spark.pipeline import PipelineConfig, run_pipeline


def _dfs(spark, docs, pages):
    docs_df = spark.createDataFrame(
        [(d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"])
                        for s in d["spans"]]) for d in docs],
        schema=corpus.DOCUMENTS_DDL)
    pages_df = spark.createDataFrame(
        [(p["media_ref"], p["document_name"], p["width"], p["height"],
          p["doc_type"],
          [(w["x1"], w["y1"], w["x2"], w["y2"], w["text"]) for w in p["words"]],
          p["lines"],
          [(q["x1"], q["y1"], q["x2"], q["y2"]) for q in p["qr_boxes"]])
         for p in pages], schema=corpus.MEDIA_PAGES_DDL)
    return docs_df, pages_df


def _corrupted(n=120, every=13):
    docs, pages = corpus.build_corpus_local(42, n)
    return corpus.corrupt_corpus_local(docs, pages, every=every)


def test_invalid_documents_matches_oracle(spark):
    docs, pages, expected = _corrupted()
    assert expected, "planting rule must hit at this corpus size"
    docs_df, pages_df = _dfs(spark, docs, pages)
    got = {r["doc_id"]: (r["status"], r["task_result"], r["reason"])
           for r in invalid_documents(docs_df, pages_df).collect()}
    want = {doc_id: (st, tr, reason) for doc_id, st, tr, reason
            in oracle.expected_invalid_docs(docs, pages)}
    assert got == want
    # both failure modes are exercised
    reasons = {v[2] for v in got.values()}
    assert reasons == {"bad_extension", "missing_media"}
    # planting bookkeeping agrees with the oracle
    assert {k: v[2] for k, v in got.items()} == expected


def test_invalid_docs_excluded_from_every_sink(spark):
    docs, pages, expected = _corrupted()
    docs_df, pages_df = _dfs(spark, docs, pages)
    outs = run_pipeline(docs_df, pages_df, PipelineConfig(validate=True))
    bad = set(expected)
    for sink in ("spans", "redactions", "values"):
        hit = (outs[sink].where(F.col("doc_id").isin(*bad)).count())
        assert hit == 0, f"invalid doc leaked into {sink}"
    inv = {r["doc_id"] for r in outs["invalid"].collect()}
    assert inv == bad


def test_valid_docs_unaffected_by_routing(spark):
    """Span-sequence equality for the surviving documents: the run over the
    corrupted corpus must equal the oracle over the valid subset."""
    docs, pages, expected = _corrupted()
    docs_df, pages_df = _dfs(spark, docs, pages)
    outs = run_pipeline(docs_df, pages_df)
    got = {(r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
           for r in outs["spans"].collect()}
    valid_docs = [d for d in docs if d["doc_id"] not in expected]
    want = set(oracle.expected_spans(valid_docs))
    assert got == want


def test_validate_off_is_passthrough(spark):
    docs, pages, expected = _corrupted()
    docs_df, pages_df = _dfs(spark, docs, pages)
    outs = run_pipeline(docs_df, pages_df, PipelineConfig(validate=False))
    assert outs["invalid"].count() == 0
    # without routing the bad-extension docs still flow (their pages exist)
    bad_ext = [k for k, v in expected.items() if v == "bad_extension"]
    assert outs["spans"].where(F.col("doc_id").isin(*bad_ext)).count() > 0


def test_invalid_webhook_payloads(spark):
    """Invalid statuses ride the notifier (the reference's ONE live webhook
    call site) with task_result + reason in the payload."""
    from ocr_redaction_engine_spark.operators.notify import notify_results

    docs, pages, expected = _corrupted()
    docs_df, pages_df = _dfs(spark, docs, pages)
    _, invalid = validity_route(docs_df, pages_df)

    sent = spark.sparkContext.accumulator(0)

    def make_sender():
        def send(batch):
            for p in batch:
                assert p["status"] == "INVALID_DOCUMENT"
                assert p["task_result"] == "Invalid Document"
                assert p["reason"] in ("bad_extension", "missing_media")
            sent.add(len(batch))
        return send

    notify_results(invalid, make_sender)
    assert sent.value == len(expected)


def test_run_job_writes_invalid_sink(spark, tmp_path):
    """Distributed planting (write_corpus invalid_every) flows through
    run_job into the invalid status sink, matching the local oracle."""
    from ocr_redaction_engine_spark.pipeline import run_job

    base = str(tmp_path)
    corpus.write_corpus(spark, f"{base}/in", n_docs=120, seed=42,
                        partitions=4, invalid_every=13)
    stats = run_job(spark, f"{base}/in/documents", f"{base}/in/media_pages",
                    f"{base}/out", f"{base}/ckpt",
                    PipelineConfig(n_buckets=4, bucket_group=4))
    docs, pages = corpus.build_corpus_local(42, 120)
    _, _, expected = corpus.corrupt_corpus_local(docs, pages, every=13)
    assert stats["n_invalid"] == len(expected) > 0
    inv = spark.read.schema(
        "doc_id string, status string, task_result string, reason string, "
        "bucket int").parquet(f"{base}/out/invalid")
    got = {r["doc_id"]: r["reason"] for r in inv.collect()}
    assert got == expected
    # no leakage into the data sinks
    bad = list(expected)
    for t in ("spans", "redactions", "values"):
        df = spark.read.parquet(f"{base}/out/{t}")
        assert df.where(F.col("doc_id").isin(*bad)).count() == 0
