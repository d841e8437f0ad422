"""T7 scheduled daily sync: each invocation is one bounded AvailableNow
drain; re-invocation resumes from the checkpoint (no reprocessing)."""

from __future__ import annotations

from caseguarddatapipeline_spark.streaming.scheduled import scheduled_daily_sync


def test_one_tick_drains_backlog_and_is_bounded(spark, sf_dir, tmp_path):
    workdir = str(tmp_path / "sync")
    summary = {
        r["change_type"]: r["n_jobs"]
        for r in scheduled_daily_sync(spark, sf_dir, workdir).collect()
    }
    assert set(summary) == {"new", "update"}
    assert all(n > 0 for n in summary.values())
    # the call RETURNED — AvailableNow bounded the stream; a
    # ProcessingTime trigger would still be running here.


def test_second_tick_consumes_only_new_arrivals(spark, sf_dir, tmp_path):
    workdir = str(tmp_path / "sync")
    first = {
        r["change_type"]: r["n_jobs"]
        for r in scheduled_daily_sync(spark, sf_dir, workdir).collect()
    }
    # same snapshot re-enqueued on tick 2: the drain processes the new
    # queue files (append semantics), so counts exactly double — but the
    # checkpoint guarantees tick-1 files are NOT reprocessed (tripling).
    second = {
        r["change_type"]: r["n_jobs"]
        for r in scheduled_daily_sync(spark, sf_dir, workdir).collect()
    }
    assert second == {k: 2 * v for k, v in first.items()}
