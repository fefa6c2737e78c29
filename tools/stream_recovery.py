"""Streaming crash-recovery bench (VERDICT r13 item 6): measured
checkpoint-resume evidence for the two durable sinks. stream_bench.py
records steady-state throughput; this records what a RESTART costs and
proves exactly-once output parity across it.

Protocol (events table of the given sf dir staged as 8 parquet files,
maxFilesPerTrigger=1 -> 8 real micro-batches):

1. write_stream_parquet (append sink, hourly_counts): the query runs in
   a CHILD PROCESS GROUP that is SIGKILL-ed — a real crash, no clean
   shutdown — as soon as the checkpoint's commits/ log shows two
   committed batches. The parent then restarts the same (query,
   checkpoint) pair and drains to completion, timing the resume. Parity:
   the recovered output (read through the sink's _spark_metadata commit
   log, which hides any torn files from the killed batch) must equal an
   uninterrupted baseline run row-for-row.

2. write_stream_upsert (foreachBatch MERGE through the versioned-commit
   protocol): SIGKILL-ed after two committed batches — r15 (VERDICT r14
   item 1): kill -9 is now IN contract. The sink commits each merged
   table as a new version (data dir first, _meta.json marker last,
   sources/versioned.py), so a crash mid-write leaves the previous
   committed version intact and the torn directory invisible. To pin the
   WORST-case crash point regardless of where the kill actually landed,
   the parent then FABRICATES the mid-overwrite state on top of whatever
   the kill left — a torn next-version directory with no commit marker
   plus the crashed writer's stale .claim file — before restarting. The
   resumed query must reclaim the claim, re-commit over the torn dir,
   and drain to row parity against the batch latest-row-per-key twin.

Prints one JSON line:
  {"parquet_sink": {"batches_before_kill", "resume_wall_sec",
                    "resume_batches", "rows", "parity"},
   "upsert_sink":  {"batches_before_kill", "resume_wall_sec",
                    "rows", "parity", "torn_injected"}}

Like bench.py / stream_bench.py, run at true idle and record the number
with host calibration in COVERAGE.md.

Run: python tools/stream_recovery.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import signal
import subprocess
import sys
import tempfile
import time

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from ml_data_pipeline_spark.catalog import load_table  # noqa: E402
from ml_data_pipeline_spark.queries import _stream_stage  # noqa: E402
from ml_data_pipeline_spark.session import get_spark  # noqa: E402
from ml_data_pipeline_spark.streaming import events_stream as ES  # noqa: E402

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from ml_data_pipeline_spark.session import get_spark
from ml_data_pipeline_spark.streaming import events_stream as ES
spark = get_spark("recovery_child")
stream = ES.read_events_stream(spark, {stage!r}, max_files_per_trigger=1)
q = {start_expr}
q.awaitTermination(600)
"""


def _wait_commits(ckpt: str, n: int, timeout: float = 300.0) -> int:
    """Block until the checkpoint's commits/ log holds >= n batch commits
    (files named 0,1,...); returns the committed count."""
    deadline = time.time() + timeout
    commits = pathlib.Path(ckpt) / "commits"
    while time.time() < deadline:
        done = [p for p in commits.glob("*") if p.name.isdigit()] if commits.exists() else []
        if len(done) >= n:
            return len(done)
        time.sleep(0.05)  # tight: batch 3 must not slip past the stop
    raise TimeoutError(f"{ckpt}: <{n} commits after {timeout}s")


def _run_child_until_commits(start_expr: str, stage: str, ckpt: str, kill_sig) -> int:
    """Launch the streaming query in its own process GROUP, wait for two
    committed batches, then deliver kill_sig to the whole group (SIGKILL =
    crash semantics: the Spark JVM dies with the Python driver)."""
    code = _CHILD.format(repo=str(_REPO), stage=stage, start_expr=start_expr)
    child = subprocess.Popen(
        [sys.executable, "-c", code],
        start_new_session=True,  # own pgid: the kill takes the JVM down too
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        seen = _wait_commits(ckpt, 2)
    finally:
        try:
            os.killpg(os.getpgid(child.pid), kill_sig)
        except ProcessLookupError:
            pass
        child.wait()
    # a batch may squeeze in between the poll and the kill — report actual
    commits = pathlib.Path(ckpt) / "commits"
    return max(seen, len([p for p in commits.glob("*") if p.name.isdigit()]))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream_recovery")
    ev_cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]

    def _write_plain(p: str) -> None:
        load_table(spark, sf, "events").select(*ev_cols).repartition(8).write.mode(
            "overwrite"
        ).parquet(p)

    stage = _stream_stage(spark, sf, "recovery8", _write_plain)
    work = tempfile.mkdtemp(prefix="mdp_recovery_")
    results: dict[str, dict] = {}

    # ---- 1. parquet append sink: SIGKILL after 2 commits, resume ----
    out, ckpt = f"{work}/pq_out", f"{work}/pq_ckpt"
    out_base, ckpt_base = f"{work}/pq_out_base", f"{work}/pq_ckpt_base"
    start_expr = (
        "ES.write_stream_parquet(ES.hourly_counts(stream), "
        f"{out!r}, {ckpt!r})"
    )
    killed_after = _run_child_until_commits(start_expr, stage, ckpt, signal.SIGKILL)

    t0 = time.monotonic()
    stream = ES.read_events_stream(spark, stage, max_files_per_trigger=1)
    q = ES.write_stream_parquet(ES.hourly_counts(stream), out, ckpt)
    q.awaitTermination(600)
    resume_wall = time.monotonic() - t0
    resume_batches = len(
        [p for p in (pathlib.Path(ckpt) / "commits").glob("*") if p.name.isdigit()]
    ) - killed_after

    # uninterrupted baseline, same staging -> same file order
    stream_b = ES.read_events_stream(spark, stage, max_files_per_trigger=1)
    qb = ES.write_stream_parquet(ES.hourly_counts(stream_b), out_base, ckpt_base)
    qb.awaitTermination(600)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, spark.read.parquet(out_base).collect()))
    results["parquet_sink"] = {
        "batches_before_kill": killed_after,
        "resume_wall_sec": round(resume_wall, 2),
        "resume_batches": resume_batches,
        "rows": len(got),
        "parity": got == want and len(got) > 0,
    }
    print(f"parquet_sink: {results['parquet_sink']}", file=sys.stderr)

    # ---- 2. foreachBatch upsert sink: SIGKILL after 2 commits (r15:
    # versioned atomic commit makes kill -9 in-contract) ----
    table, uckpt = f"{work}/state", f"{work}/up_ckpt"
    up_start_expr = (
        'ES.write_stream_upsert(stream.select("user_id", "ts", "event_type", '
        f'"value"), {table!r}, {uckpt!r}, key="user_id", order_col="ts")'
    )
    stopped_after = _run_child_until_commits(up_start_expr, stage, uckpt, signal.SIGKILL)

    # worst-case crash-point injection: whatever state the kill left,
    # overlay the exact mid-overwrite tear — an uncommitted next-version
    # dir (parquet files, NO _meta.json) + the dead writer's stale claim
    from ml_data_pipeline_spark.sources.versioned import VersionedDataset

    vd = VersionedDataset(spark, table, "state")
    latest = vd.latest_version()
    torn_injected = latest is not None
    if torn_injected:
        vbase = pathlib.Path(table) / "state"
        torn = vbase / f"v{latest + 1}"
        if torn.exists():
            shutil.rmtree(torn)
        shutil.copytree(vbase / f"v{latest}", torn)
        (torn / "_meta.json").unlink()
        (vbase / f".v{latest + 1}.claim").touch()
        # the torn version must be invisible to the reader right now
        assert vd.latest_version() == latest

    t0 = time.monotonic()
    stream_u2 = ES.read_events_stream(spark, stage, max_files_per_trigger=1).select(
        "user_id", "ts", "event_type", "value"
    )
    qu2 = ES.write_stream_upsert(stream_u2, table, uckpt, key="user_id", order_col="ts")
    qu2.awaitTermination(600)
    up_resume_wall = time.monotonic() - t0

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # batch twin: latest row per user. A (user, ts) tie at the max has an
    # engine-unspecified winner (the sink breaks it by key order WITHIN a
    # batch, but across batch boundaries the later batch wins) — compare
    # values only where the argmax is unique, key sets always.
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    mx = Window.partitionBy("user_id")
    batch = (
        load_table(spark, sf, "events")
        .withColumn("__mt", F.max("ts").over(mx))
        .withColumn("__nmax", F.sum((F.col("ts") == F.col("__mt")).cast("int")).over(mx))
        .withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
    )
    got_u = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in ES.read_upsert_table(spark, table).collect()
    }
    want_rows = batch.collect()
    want_keys = {r["user_id"] for r in want_rows}
    want_unique = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in want_rows
        if r["__nmax"] == 1
    }
    parity = (
        set(got_u) == want_keys
        and len(got_u) > 0
        and all(got_u[u] == v for u, v in want_unique.items())
    )
    results["upsert_sink"] = {
        "batches_before_kill": stopped_after,
        "resume_wall_sec": round(up_resume_wall, 2),
        "rows": len(got_u),
        "parity": parity,
        "torn_injected": torn_injected,
    }
    print(f"upsert_sink: {results['upsert_sink']}", file=sys.stderr)

    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])
    print(json.dumps({"sf_dir": sf, "loadavg_end": load1, **results}))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
