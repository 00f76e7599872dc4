"""MERGE INTO submission — the CDC-batch counterpart of ingest.py: a
MergeJob of `{"id", "files", "opColumn", "deleteOp"}` driven through a
spark-submit main (`graft.jobs.MergeRunner`). Files carry the table
schema plus an op column; rows whose op equals `deleteOp` become
row-key delete markers, the rest are put — ONE atomic commit. The job
id doubles as the exactly-once transaction marker, so resubmitting a
committed job is a recorded no-op (`DUPLICATE`).
"""

import json
import os
import tempfile
import uuid


class MergeJob:
    """One merge (CDC) job: upsert/delete rows destined for a table."""

    def __init__(self, files, job_id=None, file_format="parquet",
                 op_column="_op", delete_op="delete"):
        if not files:
            raise ValueError("files must be specified")
        if file_format not in ("parquet", "jsonl"):
            raise ValueError(f"unknown format: {file_format}")
        self.job_id = job_id or str(uuid.uuid4())
        self.files = list(files)
        self.file_format = file_format
        self.op_column = op_column
        self.delete_op = delete_op

    def to_json(self):
        return json.dumps(
            {"id": self.job_id, "files": self.files, "format": self.file_format,
             "opColumn": self.op_column, "deleteOp": self.delete_op})


class MergeJobSender:
    """Submits merge jobs for a client's table."""

    def __init__(self, client):
        self.client = client

    def send(self, job: MergeJob):
        """Run the job; returns the status dict {"id", "state":
        COMMITTED|DUPLICATE|FAILED, "files", "putRows", "deleteKeys",
        "error"}."""
        status_dir = tempfile.mkdtemp(prefix="graft-merge-status-")
        jfile = os.path.join(status_dir, f".{job.job_id}.job.json")
        with open(jfile, "w") as f:
            f.write(job.to_json())
        proc = self.client._submit(
            "graft.jobs.MergeRunner",
            [self.client.table_dir, "@" + jfile, status_dir])
        status_file = os.path.join(status_dir, f"{job.job_id}.status.json")
        if os.path.exists(status_file):
            with open(status_file) as f:
                return json.load(f)
        return {"id": job.job_id, "state": "FAILED", "files": len(job.files),
                "putRows": 0, "deleteKeys": 0, "error": (proc.stderr or "")[-2000:]}
