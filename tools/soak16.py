"""16x data weak-scaling soak (VERDICT r3 #7): run the end-to-end redaction
pipeline at 1x / 4x / 16x the bench corpus (360k / 1.44M / 5.76M docs) on
the SAME 32 cores, recording wall, throughput, and peak resident memory
(JVM + pyspark worker daemons, sampled from /proc via ps) — the evidence
that doc-count growth costs linear time and FLAT memory, one more decade
toward the 100x design claim (r3 had 1x/4x only).

Writes BENCH_datascale_r04.json. Usage: python tools/soak16.py [cpus]
"""
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import bench

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
CPUS = int(_args[0]) if _args else 32
BASE_DOCS = 360_000


class RssTracker(threading.Thread):
    """Samples the summed RSS of every java + python process (the Spark JVM
    and its Arrow worker daemons) every 2 s; keeps the peak."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak_kb = 0
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            try:
                out = subprocess.run(
                    ["ps", "-eo", "rss,comm"], capture_output=True, text=True
                ).stdout
                total = sum(int(line.split()[0]) for line in out.splitlines()[1:]
                            if line.split()[-1].startswith(("java", "python")))
                self.peak_kb = max(self.peak_kb, total)
            except Exception:
                pass
            self._stop.wait(2.0)

    def stop(self) -> int:
        self._stop.set()
        return self.peak_kb


MODE = "extraction" if "--extraction" in sys.argv else "pipeline"


def leg(factor: int, corpus_base: str | None) -> dict:
    n = BASE_DOCS * factor
    tracker = RssTracker()
    tracker.start()
    runner = (bench.run_extraction_once if MODE == "extraction"
              else bench.run_pipeline_once)
    r = runner(CPUS, n, single=True, corpus_base=corpus_base)
    peak_kb = tracker.stop()
    r["factor"] = factor
    r["peak_rss_gb"] = round(peak_kb / 1024 / 1024, 2)
    return r


def main():
    suffix = "_web" if MODE == "extraction" else ""
    legs = {1: None,
            4: bench.CORPUS_DIR + suffix + "_4x",
            16: bench.CORPUS_DIR + suffix + "_16x"}
    runs = {f: [] for f in legs}
    # interleave 2 rounds so steal windows hit every size
    for _ in range(2):
        for f, base in legs.items():
            sys.stderr.write(f"[soak16] leg {f}x starting\n")
            t0 = time.time()
            runs[f].append(leg(f, base))
            sys.stderr.write(f"[soak16] leg {f}x done in {time.time()-t0:.0f}s\n")
    best = {f: min(rs, key=lambda r: r["wall_sec"]) for f, rs in runs.items()}
    dps = {f: round(BASE_DOCS * f / best[f]["wall_sec"], 2) for f in legs}
    result = {
        "metric": f"{MODE}_data_weak_scaling_16x",
        "cpus": CPUS,
        "ndocs": {f"{f}x": BASE_DOCS * f for f in legs},
        "wall_sec": {f"{f}x": best[f]["wall_sec"] for f in legs},
        "docs_per_sec": {f"{f}x": dps[f] for f in legs},
        "peak_rss_gb": {f"{f}x": best[f]["peak_rss_gb"] for f in legs},
        "data_scaling_efficiency": {
            "1x->4x": round(dps[4] / dps[1], 3),
            "4x->16x": round(dps[16] / dps[4], 3),
            "1x->16x": round(dps[16] / dps[1], 3),
        },
        "runs": {f"{f}x": rs for f, rs in runs.items()},
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                       if "tools" in os.path.abspath(__file__) else ".",
                       "BENCH_datascale_r04.json")
    out = ("/root/repo/BENCH_datascale_r04.json" if MODE == "pipeline"
           else "/root/repo/BENCH_datascale_extraction_r04.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "runs"}))


if __name__ == "__main__":
    main()
