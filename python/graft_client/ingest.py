"""Ingest submission, mirroring the reference Python client's ingest
surface (reference: python/src/sleeper/ingest.py — an IngestJob of
`{"id", "files"}` sent to the ingest queue). graft's portable transport
is the same job JSON driven through a spark-submit main
(`graft.jobs.IngestRunner`); the job id doubles as the table's
exactly-once transaction marker, so resubmitting a committed job is a
recorded no-op (`DUPLICATE`) — the queue-redelivery semantics the
reference gets from its job tracker.
"""

import json
import os
import tempfile
import uuid


class IngestJob:
    """One ingest job: files (parquet or JSONL) destined for a table."""

    def __init__(self, files, job_id=None, file_format="parquet"):
        if not files:
            raise ValueError("files must be specified")
        if file_format not in ("parquet", "jsonl"):
            raise ValueError(f"unknown format: {file_format}")
        self.job_id = job_id or str(uuid.uuid4())
        self.files = list(files)
        self.file_format = file_format

    def to_json(self):
        return json.dumps(
            {"id": self.job_id, "files": self.files, "format": self.file_format})


class IngestJobSender:
    """Submits ingest jobs for a client's table (reference:
    IngestJobSender.send — there to SQS, here through spark-submit)."""

    def __init__(self, client):
        self.client = client

    def send(self, job: IngestJob):
        """Run the job; returns the status dict
        {"id", "state": COMMITTED|DUPLICATE|FAILED, "files", "rows", "error"}."""
        status_dir = tempfile.mkdtemp(prefix="graft-ingest-status-")
        jfile = os.path.join(status_dir, f".{job.job_id}.job.json")
        with open(jfile, "w") as f:
            f.write(job.to_json())
        proc = self.client._submit(
            "graft.jobs.IngestRunner",
            [self.client.table_dir, "@" + jfile, status_dir])
        status_file = os.path.join(status_dir, f"{job.job_id}.status.json")
        if os.path.exists(status_file):
            with open(status_file) as f:
                return json.load(f)
        return {"id": job.job_id, "state": "FAILED", "files": len(job.files),
                "rows": 0, "error": (proc.stderr or "")[-2000:]}
