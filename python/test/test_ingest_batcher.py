"""Unit tests for the batcher's batching rules (mirroring the shapes of
the reference's IngestBatcherTest / MinBatchSize / MaxBatchSize suites)
— pure logic with a fake sender and injected clock, no Spark.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from graft_client.ingest_batcher import IngestBatcher  # noqa: E402


class FakeSender:
    def __init__(self):
        self.jobs = []

    def send(self, job):
        self.jobs.append(job)
        return {"id": job.job_id, "state": "COMMITTED",
                "files": len(job.files), "rows": 0, "error": None}


def batcher(**kw):
    clock = {"t": 1000.0}
    ids = iter(f"job-{i}" for i in range(100))
    sender = FakeSender()
    b = IngestBatcher(sender, job_id_supplier=lambda: next(ids),
                      time_supplier=lambda: clock["t"], **kw)
    return b, sender, clock


def test_below_minimums_sends_nothing():
    b, sender, _ = batcher(min_job_files=3, min_job_bytes=100)
    b.submit(["a", "b"], size_bytes=500)
    assert b.batch_files() == []
    assert sender.jobs == [] and len(b.pending) == 2


def test_min_files_and_min_bytes_must_both_hold():
    b, sender, _ = batcher(min_job_files=2, min_job_bytes=1000)
    b.submit(["a", "b"], size_bytes=100)  # files ok, bytes not
    assert b.batch_files() == []
    b.submit(["c"], size_bytes=900)  # now 1100 bytes across 3 files
    statuses = b.batch_files()
    assert len(statuses) == 1
    assert sender.jobs[0].files == ["a", "b", "c"]
    assert b.pending == []


def test_max_age_overrides_minimums():
    b, sender, clock = batcher(min_job_files=10, min_job_bytes=1 << 40,
                               max_file_age_seconds=300)
    b.submit(["old"], size_bytes=1)
    assert b.batch_files() == []  # not old yet
    clock["t"] += 301
    statuses = b.batch_files()
    assert len(statuses) == 1 and sender.jobs[0].files == ["old"]


def test_batches_split_at_max_files_and_bytes():
    b, sender, _ = batcher(min_job_files=1, min_job_bytes=0,
                           max_job_files=2, max_job_bytes=100)
    b.submit(["a"], size_bytes=60)
    b.submit(["b"], size_bytes=60)  # no space in batch 1 -> batch 2
    b.submit(["c"], size_bytes=30)  # first-fit lands in batch 1
    b.submit(["d"], size_bytes=30)  # batch 1 full (2 files) -> batch 2
    b.batch_files()
    assert [j.files for j in sender.jobs] == [["a", "c"], ["b", "d"]]


def test_oversized_file_ships_alone():
    b, sender, _ = batcher(min_job_files=1, min_job_bytes=0,
                           max_job_bytes=100)
    b.submit(["big"], size_bytes=500)
    b.submit(["small"], size_bytes=10)
    b.batch_files()
    assert [j.files for j in sender.jobs] == [["big"], ["small"]]


def test_sent_files_leave_pending_and_resend_is_new_state():
    b, sender, _ = batcher(min_job_files=1, min_job_bytes=0)
    b.submit(["a"], size_bytes=1)
    assert len(b.batch_files()) == 1
    assert b.pending == []
    assert b.batch_files() == []  # nothing pending -> no jobs
