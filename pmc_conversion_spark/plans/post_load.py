"""Post-load hooks: async status polling (driver-side, not a data op).

Reference: scripts/transmart_api_calls.py:95-113 — poll every
``interval`` seconds, up to ``max_retries`` times, until a terminal
state (COMPLETED/FAILED); luigi-pipeline/main.py:158 sets the 240×30 s
budget. REST calls stay driver-side in the Spark engine too
(SURVEY §3.1 boundary mapping).
"""

from __future__ import annotations

import time
from collections.abc import Callable

TERMINAL_STATES = ("COMPLETED", "FAILED")


class StatusPollTimeout(TimeoutError):
    pass


def poll_status(fetch: Callable[[], str], *, max_retries: int = 240,
                interval_s: float = 30.0,
                sleep: Callable[[float], None] = time.sleep) -> str:
    """Poll ``fetch()`` until a terminal state or the retry budget is
    spent (then raises StatusPollTimeout). ``sleep`` injectable for
    tests."""
    for attempt in range(max_retries):
        status = fetch()
        if status in TERMINAL_STATES:
            return status
        if attempt < max_retries - 1:
            sleep(interval_s)
    raise StatusPollTimeout(
        f"status not terminal after {max_retries} polls")


def final_status_per_job(status_events):
    """Batch form over a status-event log DataFrame (job_id, seq,
    status): the job's outcome is its first terminal status by seq, else
    'TIMEOUT' — the declarative twin of the polling loop."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    terminal = status_events.filter(F.col("status").isin(*TERMINAL_STATES))
    w = Window.partitionBy("job_id").orderBy("seq")
    first_terminal = (terminal
                      .withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") == 1)
                      .select("job_id", F.col("status").alias("final_status")))
    all_jobs = status_events.select("job_id").distinct()
    return (all_jobs.join(first_terminal, "job_id", "left")
            .select("job_id",
                    F.coalesce("final_status", F.lit("TIMEOUT"))
                    .alias("final_status")))
