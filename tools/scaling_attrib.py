"""Per-component attribution of the 8→32-lane scaling step (VERDICT r4 #1).

For each pipeline (redaction / extraction) at each parallelism level, run
one warmed, timed pass with the Spark event log enabled and decompose the
wall-clock into:

  * task-busy time (sum of executor run time across tasks) → the share of
    ``wall × cores`` the engine actually used (occupancy);
  * in-task components: executor CPU, JVM GC, shuffle read/write wait,
    (de)serialization, scheduler delay (launch − deserialize − run);
  * out-of-task time: wall − (task time / cores) — driver planning, stage
    scheduling gaps, commit coordination;
  * straggler shape per stage: max vs median task duration.

Alongside, measure what the HOST offers at each level with three
Spark-free probes (multiprocessing, fresh interpreters):
  * ``alu``    — the existing tight integer loop (L1-resident);
  * ``stream`` — numpy array sum/copy over ~64 MB per worker
                 (memory-bandwidth-bound, like parquet decode + scans);
  * ``regex``  — Python ``re`` over generated strings (branchy
                 string-scan, the closest analog of the narrow pass).

The point: the ALU probe is the ceiling for compute; the stream/regex
probes are the ceiling for what the pipelines actually do. Engine
efficiency ÷ matching-probe efficiency isolates Spark's own contribution
from the box running out of memory bandwidth at 32 lanes.

Usage: python tools/scaling_attrib.py [--cpus 8 32] [--ndocs 360000]
Writes SCALING_ATTRIB.json at the repo root and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# host probes (run in subprocesses so the JVM never shares the window)
# ---------------------------------------------------------------------------

_PROBE_SRC = r"""
import json, re, sys, time
import numpy as np

kind, seconds = sys.argv[1], float(sys.argv[2])

def burn_alu(seconds):
    t0 = time.perf_counter(); n = 0; x = 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 10000
    return n

def burn_stream(seconds):
    a = np.arange(8_000_000, dtype=np.int64)   # 64 MB, far beyond L2
    b = np.empty_like(a)
    np.copyto(b, a); int(b.sum())              # fault pages in, untimed
    t0 = time.perf_counter(); n = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(b, a); s = int(b.sum())
        n += a.nbytes * 2                      # bytes moved (copy+sum read)
    return n

def burn_regex(seconds):
    pat = re.compile(r"[A-Z]{5}[0-9]{4}[A-Z]|\d{4}\s\d{4}\s\d{4}")
    rows = [f"line {i} PQRST{i%10000:04d}Z tail 1234 5678 9012 x" * 3
            for i in range(2000)]
    t0 = time.perf_counter(); n = 0
    while time.perf_counter() - t0 < seconds:
        for r in rows:
            if pat.search(r):
                n += 1
    return n

print(json.dumps({"count": {"alu": burn_alu, "stream": burn_stream,
                            "regex": burn_regex}[kind](seconds)}))
"""


def host_probe(kind: str, procs: int, seconds: float = 2.0) -> float:
    """Aggregate rate across ``procs`` fresh python processes (work/sec)."""
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_PROBE_SRC)
        path = f.name
    try:
        ps = [subprocess.Popen([sys.executable, path, kind, str(seconds)],
                               stdout=subprocess.PIPE, text=True)
              for _ in range(procs)]
        total = 0
        for p in ps:
            out, _ = p.communicate(timeout=seconds * 20 + 60)
            total += json.loads(out)["count"]
        return total / seconds
    finally:
        os.unlink(path)


# ---------------------------------------------------------------------------
# event-log decomposition
# ---------------------------------------------------------------------------

def _event_lines(path: str):
    """Yield event-log lines from a single-file or rolling (v2 directory)
    Spark event log."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.startswith("events_"):
                yield from open(os.path.join(path, name))
    else:
        yield from open(path)


def parse_eventlog(path: str, t0_ms: float, t1_ms: float, cores: int) -> dict:
    """Aggregate task metrics for tasks finishing inside [t0_ms, t1_ms]."""
    per_stage: dict = {}
    agg = {"tasks": 0, "run_ms": 0.0, "cpu_ms": 0.0, "gc_ms": 0.0,
           "deser_ms": 0.0, "ser_ms": 0.0, "sched_delay_ms": 0.0,
           "shuffle_fetch_wait_ms": 0.0, "shuffle_write_ms": 0.0}
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        info = ev.get("Task Info") or {}
        if not (t0_ms <= info.get("Finish Time", 0) <= t1_ms):
            continue
        m = ev.get("Task Metrics") or {}
        sr = m.get("Shuffle Read Metrics") or {}
        sw = m.get("Shuffle Write Metrics") or {}
        run = m.get("Executor Run Time", 0)
        deser = m.get("Executor Deserialize Time", 0)
        launched = info.get("Finish Time", 0) - info.get("Launch Time", 0)
        agg["tasks"] += 1
        agg["run_ms"] += run
        agg["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
        agg["gc_ms"] += m.get("JVM GC Time", 0)
        agg["deser_ms"] += deser
        agg["ser_ms"] += m.get("Result Serialization Time", 0)
        agg["sched_delay_ms"] += max(0, launched - run - deser
                                     - m.get("Result Serialization Time", 0))
        agg["shuffle_fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
        agg["shuffle_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
        sid = ev.get("Stage ID")
        per_stage.setdefault(sid, []).append(run)
    stages = {}
    for sid, runs in sorted(per_stage.items()):
        med = statistics.median(runs)
        stages[str(sid)] = {
            "tasks": len(runs), "sum_ms": round(sum(runs), 1),
            "median_ms": round(med, 1), "max_ms": round(max(runs), 1),
            "skew": round(max(runs) / med, 2) if med > 0 else None,
        }
    return {"agg": {k: round(v, 1) for k, v in agg.items()},
            "stages": stages}


def run_leg(which: str, cpus: int, n_docs: int) -> dict:
    """One warmed+timed pass with event logging, decomposed."""
    import bench  # repo-root bench.py
    from pyspark.sql import SparkSession

    elog = tempfile.mkdtemp(prefix=f"elog_{which}_{cpus}_")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.eventLog.dir", f"file://{elog}")
             .appName(f"attrib-{which}-{cpus}").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    if which == "extraction":
        from ocr_redaction_engine_spark.extraction_pipeline import extract_spans
        docs_path, pages_path = bench.ensure_web_corpus(spark, n_docs)
        documents = spark.read.parquet(docs_path)
        media_pages = spark.read.parquet(pages_path)

        def one_pass():
            t0 = time.time()
            bench._force(extract_spans(documents, media_pages))
            return time.time() - t0
    else:
        from ocr_redaction_engine_spark.pipeline import (PipelineConfig,
                                                         run_pipeline)
        docs_path, pages_path = bench.ensure_corpus(spark, n_docs)
        documents = spark.read.parquet(docs_path)
        media_pages = spark.read.parquet(pages_path)
        cfg = PipelineConfig(probe_documents=spark.read.schema(
            "doc_id string, spans array<struct<kind:string,media_ref:string>>"
        ).parquet(docs_path))

        def one_pass():
            t0 = time.time()
            outs = run_pipeline(documents, media_pages, cfg)
            bench._force(outs["spans"])
            bench._force(outs["redactions"])
            return time.time() - t0

    def _host_busy_sec():
        # whole-VM busy CPU (user+nice+sys+irq+softirq) from /proc/stat —
        # counts the JVM AND its Python workers (which the event log's
        # executor metrics cannot see). local[8] + an Arrow stage uses up
        # to 16 host cores; this exposes that hidden parallelism.
        with open("/proc/stat") as f:
            p = f.readline().split()
        hz = os.sysconf("SC_CLK_TCK")
        return (int(p[1]) + int(p[2]) + int(p[3])
                + int(p[6]) + int(p[7])) / hz

    one_pass()                                   # warm (untimed)
    busy0 = _host_busy_sec()
    t0_ms = time.time() * 1000
    wall = one_pass()
    t1_ms = time.time() * 1000
    host_cpu_sec = _host_busy_sec() - busy0
    # flush the event log
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10000)
    spark.stop()
    logs = [os.path.join(elog, f) for f in os.listdir(elog)
            if not f.startswith(".")]
    decomp = parse_eventlog(logs[0], t0_ms, t1_ms, cpus) if logs else {}
    a = decomp.get("agg", {})
    wall_cores_ms = wall * 1000 * cpus
    return {
        "cpus": cpus, "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        # host cores actually busy during the pass (JVM + Python workers
        # + driver); for local[8] pipeline runs this exceeds 8 — the
        # "N-lane" baseline borrows idle host cores for its Python side
        "host_cpu_sec": round(host_cpu_sec, 1),
        "effective_cores": round(host_cpu_sec / wall, 1),
        "occupancy": round(a.get("run_ms", 0) / wall_cores_ms, 3),
        "gc_share_of_run": round(a.get("gc_ms", 0)
                                 / max(a.get("run_ms", 1), 1), 3),
        "cpu_share_of_run": round(a.get("cpu_ms", 0)
                                  / max(a.get("run_ms", 1), 1), 3),
        "out_of_task_sec": round(wall - a.get("run_ms", 0)
                                 / 1000 / cpus, 3),
        "decomp": decomp,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--ndocs", type=int, default=360_000)
    ap.add_argument("--probe-seconds", type=float, default=2.0)
    ap.add_argument("--skip-probes", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_ATTRIB.json"))
    args = ap.parse_args()

    result: dict = {"ndocs": args.ndocs, "legs": {}, "probes": {}}
    for which in ("extraction", "pipeline"):
        for c in args.cpus:
            print(f"== {which} @ local[{c}] ==", flush=True)
            leg = run_leg(which, c, args.ndocs)
            result["legs"][f"{which}_{c}"] = leg
            print(json.dumps({k: v for k, v in leg.items() if k != "decomp"},
                             indent=None), flush=True)
    if not args.skip_probes:
        for kind in ("alu", "stream", "regex"):
            rates = {str(c): host_probe(kind, c, args.probe_seconds)
                     for c in args.cpus}
            result["probes"][kind] = rates
            cs = args.cpus
            if len(cs) >= 2:
                eff = (rates[str(cs[-1])] / rates[str(cs[0])]) / (cs[-1] / cs[0])
                result["probes"][f"{kind}_step_eff"] = round(eff, 3)
            print(f"probe {kind}: {rates} step_eff="
                  f"{result['probes'].get(f'{kind}_step_eff')}", flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
