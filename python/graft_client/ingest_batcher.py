"""Ingest batcher, mirroring the reference's batcher semantics
(reference: java/ingest/ingest-batcher-core/.../IngestBatcher.java and
python/src/sleeper/ingest_batcher.py): files are tracked as they arrive
and become ingest jobs when EITHER any file exceeds the max age OR the
pending set meets both the min-file-count and min-total-bytes bars;
jobs are then formed by first-fit packing capped at max files / max
bytes per job (a single file larger than the byte cap still ships alone
in its own job). Defaults mirror the reference's table defaults
(TableDefaultProperty: min 1 file / 1G, max 100 files / 5G, 300 s max
age).

Pure client-side logic over the client's IngestJobSender — no queue
infrastructure; `batch_files()` is the "job creator runs now" trigger
(the reference runs it on a schedule).
"""

import os
import time
import uuid

from .ingest import IngestJob


class TrackedFile:
    def __init__(self, path, size_bytes, received_time):
        self.path = path
        self.size_bytes = size_bytes
        self.received_time = received_time


class IngestBatcher:
    def __init__(self, sender, min_job_files=1, min_job_bytes=1 << 30,
                 max_job_files=100, max_job_bytes=5 << 30,
                 max_file_age_seconds=300, file_format="parquet",
                 job_id_supplier=None, time_supplier=None):
        self.sender = sender
        self.min_job_files = min_job_files
        self.min_job_bytes = min_job_bytes
        self.max_job_files = max_job_files
        self.max_job_bytes = max_job_bytes
        self.max_file_age_seconds = max_file_age_seconds
        self.file_format = file_format
        self._job_id = job_id_supplier or (lambda: str(uuid.uuid4()))
        self._now = time_supplier or time.time
        self.pending = []  # oldest first

    def submit(self, files, size_bytes=None):
        """Track files for a future batch (reference:
        IngestBatcherSubmitRequest). Sizes default to the filesystem's."""
        for f in files:
            size = size_bytes if size_bytes is not None else os.path.getsize(f)
            self.pending.append(TrackedFile(f, size, self._now()))

    def _should_create_batches(self):
        if not self.pending:
            return False
        cutoff = self._now() - self.max_file_age_seconds
        if any(f.received_time < cutoff for f in self.pending):
            return True
        return (len(self.pending) >= self.min_job_files
                and sum(f.size_bytes for f in self.pending) >= self.min_job_bytes)

    def _create_batches(self):
        """First-fit packing in arrival order, capped at max files/bytes
        per batch; an oversized file opens (and overflows) its own batch
        — exactly the reference's BatchCreator."""
        batches = []  # (files, space_bytes)
        for f in self.pending:
            placed = None
            for b in batches:
                if f.size_bytes <= b[1] and len(b[0]) < self.max_job_files:
                    placed = b
                    break
            if placed is None:
                placed = [[], self.max_job_bytes]
                batches.append(placed)
            placed[0].append(f)
            placed[1] -= f.size_bytes
        return [b[0] for b in batches]

    def batch_files(self):
        """Run the batcher once: send a job per batch, drop sent files
        from the pending set. Returns the per-job status dicts."""
        if not self._should_create_batches():
            return []
        statuses = []
        sent = set()
        for batch in self._create_batches():
            job = IngestJob([f.path for f in batch], job_id=self._job_id(),
                            file_format=self.file_format)
            statuses.append(self.sender.send(job))
            sent.update(id(f) for f in batch)
        self.pending = [f for f in self.pending if id(f) not in sent]
        return statuses
