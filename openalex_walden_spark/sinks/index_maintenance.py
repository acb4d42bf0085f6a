"""Search-index maintenance orchestration (reference
``notebooks/maintenance/expunge_elasticsearch_deletes.py``).

Weekly forcemerge-to-expunge-deletes with the reference's five
safeguards, expressed as a dependency-injected state machine so every
path is testable without a cluster:

  1. skip when the delete ratio is below the threshold (merging a
     healthy index burns IO for nothing);
  2. abort when any data node is above the disk ceiling (a forcemerge
     temporarily doubles segment storage);
  3. wait — bounded — for active bulk indexing to settle first;
  4. fire async and poll the task;
  5. abort the wait (never the merge — ES finishes it server-side)
     after the max runtime.

The injected ``client`` exposes ``stats() -> dict``,
``disk_usage() -> list[(node, pct)]``, ``active_bulk_tasks() -> list``,
``start_forcemerge() -> task_id``, ``task_done(task_id) -> bool``;
``clock``/``sleep`` are injectable for tests.
"""

from __future__ import annotations

import time as _time


def expunge_deletes(
    client,
    *,
    delete_threshold_pct: float = 15.0,
    max_disk_pct: float = 80.0,
    bulk_wait_seconds: float = 3600.0,
    max_runtime_seconds: float = 12 * 3600.0,
    poll_interval_seconds: float = 300.0,
    clock=_time.monotonic,
    sleep=_time.sleep,
) -> dict:
    """Run the guarded expunge; returns a report with ``status`` one of
    ``skipped`` / ``completed`` / ``timed_out`` and the baseline stats.
    Raises RuntimeError on the disk and bulk-wait aborts (the
    reference's hard failures)."""
    before = client.stats()
    total = before["docs"] + before["deleted"]
    delete_pct = 100.0 * before["deleted"] / total if total else 0.0
    if delete_pct < delete_threshold_pct:
        return {
            "status": "skipped",
            "reason": f"delete_pct={delete_pct:.2f}% < "
                      f"threshold={delete_threshold_pct}%",
            "before": before,
        }

    over = [(n, p) for n, p in client.disk_usage() if p > max_disk_pct]
    if over:
        details = ", ".join(f"{n}={p}%" for n, p in over)
        raise RuntimeError(
            f"Aborting: node(s) above {max_disk_pct}% disk: {details}"
        )

    deadline = clock() + bulk_wait_seconds
    while True:
        tasks = client.active_bulk_tasks()
        if not tasks:
            break
        if clock() >= deadline:
            raise RuntimeError(
                f"Aborting: {len(tasks)} bulk task(s) still active after "
                f"{bulk_wait_seconds:.0f}s wait"
            )
        sleep(min(60.0, poll_interval_seconds))

    task_id = client.start_forcemerge()
    merge_deadline = clock() + max_runtime_seconds
    while not client.task_done(task_id):
        if clock() >= merge_deadline:
            return {
                "status": "timed_out",
                "task_id": task_id,
                "before": before,
                "note": "wait abandoned; ES completes the merge server-side",
            }
        sleep(poll_interval_seconds)
    return {
        "status": "completed",
        "task_id": task_id,
        "before": before,
        "after": client.stats(),
    }
