"""Streaming throughput micro-bench (VERDICT r12 item 6): the st_* family
is correctness-green (batch/stream parity gates) but had no recorded
rate number — this records one, so the streaming path has a measured
baseline before anyone scales it.

Protocol: stage the events table of the given sf dir (sf0.1 = 100k rows;
pass /tmp/mdp_sf1 for the 1M-row amortization point) as 8 parquet files,
drain it through the two headline streaming pipelines with
trigger=availableNow and maxFilesPerTrigger=2 (4 real micro-batches, so
the number includes per-batch planning + state-store commit overhead,
not just one bulk pass):

- hourly_counts: watermarked 1h tumbling window aggregation (state-store
  aggregation path);
- dedup_events: dropDuplicatesWithinWatermark on event_id (state-store
  dedup path) over the input staged DOUBLED (every row delivered twice —
  the at-least-once redelivery shape the operator exists for).

Prints one JSON line {pipeline: {rows, wall_sec, rows_per_sec}, ...}.
rows = INPUT rows consumed (the throughput denominator a source sees).
rows_out for dedup varies with file arrival order BY DESIGN: the stage
shuffles events across the 8 files, so rows older than the advanced
watermark in a later micro-batch are dropped as late — correct
streaming semantics (the one-batch correctness gate st_stream_dedup
pins the exact-dedup case; this tool measures rate, not survival).
Record the numbers + host calibration in COVERAGE.md next to the batch
bench; like bench.py, run at true idle (loadavg < 0.5).

Run: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from ml_data_pipeline_spark.catalog import load_table  # noqa: E402
from ml_data_pipeline_spark.queries import _stream_stage  # noqa: E402
from ml_data_pipeline_spark.session import get_spark  # noqa: E402
from ml_data_pipeline_spark.streaming import events_stream as ES  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream_bench")
    ev_cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]

    def _write_plain(p: str) -> None:
        load_table(spark, sf, "events").select(*ev_cols).repartition(8).write.mode(
            "overwrite"
        ).parquet(p)

    def _write_doubled(p: str) -> None:
        ev = load_table(spark, sf, "events").select(*ev_cols)
        ev.unionAll(ev).repartition(8).write.mode("overwrite").parquet(p)

    plain = _stream_stage(spark, sf, "bench_plain8", _write_plain)
    doubled = _stream_stage(spark, sf, "bench_doubled8", _write_doubled)
    n_plain = spark.read.parquet(plain).count()  # also JVM/stage warm-up
    n_doubled = spark.read.parquet(doubled).count()

    results: dict[str, dict] = {}

    def run(name: str, stage_dir: str, n_in: int, build, mode: str) -> None:
        stream = ES.read_events_stream(spark, stage_dir, max_files_per_trigger=2)
        t0 = time.monotonic()
        out = ES.run_to_memory(build(stream), f"bench_{name}", mode)
        n_out = out.count()  # materialized memory sink — wall includes it
        wall = time.monotonic() - t0
        results[name] = {
            "rows_in": n_in,
            "rows_out": n_out,
            "wall_sec": round(wall, 2),
            "rows_per_sec": int(n_in / wall),
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    run("hourly_counts", plain, n_plain, ES.hourly_counts, "complete")
    run("dedup_events", doubled, n_doubled, ES.dedup_events, "append")
    # session windows: the most state-heavy built-in (merging session
    # state across micro-batches); append mode so finalized sessions
    # emit as the watermark passes them
    run("session_counts", plain, n_plain, ES.session_counts, "append")

    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])
    print(json.dumps({"sf_dir": sf, "loadavg_end": load1, "pipelines": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
