"""Table administration through spark-submit (`graft.jobs.AdminRunner`):
row-key deletes (generation-aware tombstones, exactly-once on the job
id), state-version capture, and deep clone at a version — the Python
reach into the engine's mutable-row machinery, same thin-transport
contract as ingest/merge (process invocation + file IO only).
"""

import json
import os
import tempfile
import uuid


class DeleteJob:
    """One row-key delete: inline key tuples OR key files.

    keys:   list of row-key tuples (a bare scalar works for single-key
            tables), e.g. [7, 33] or [[7, "a"], [8, "b"]].
    files:  alternatively, parquet/jsonl files carrying the row-key
            columns.
    purge:  compact the affected leaves before returning (physical
            removal — the takedown/compliance shape).
    """

    def __init__(self, keys=None, files=None, job_id=None,
                 file_format="parquet", purge=False):
        if (keys is None) == (files is None):
            raise ValueError("give exactly one of keys / files")
        if file_format not in ("parquet", "jsonl"):
            raise ValueError(f"unknown format: {file_format}")
        self.job_id = job_id or str(uuid.uuid4())
        self.keys = list(keys) if keys is not None else None
        self.files = list(files) if files is not None else None
        self.file_format = file_format
        self.purge = bool(purge)

    def to_json(self):
        body = {"id": self.job_id, "purge": self.purge}
        if self.keys is not None:
            body["keys"] = self.keys
        else:
            body["files"] = self.files
            body["format"] = self.file_format
        return json.dumps(body)


class AdminClient:
    """Admin operations for a client's table (delete / version / clone)."""

    def __init__(self, client):
        self.client = client

    def delete_keys(self, job: DeleteJob):
        """Run the delete; returns {"op", "id", "state":
        COMMITTED|DUPLICATE|FAILED, "deleteKeys", "error"}."""
        status_dir = tempfile.mkdtemp(prefix="graft-admin-status-")
        jfile = os.path.join(status_dir, f".{job.job_id}.job.json")
        with open(jfile, "w") as f:
            f.write(job.to_json())
        proc = self.client._submit(
            "graft.jobs.AdminRunner",
            ["delete", self.client.table_dir, "@" + jfile, status_dir])
        return self._status(status_dir, job.job_id, proc)

    def table_version(self):
        """The table's current state-store version (the handle for
        `clone_at` and for `as_of_version` time-travel queries)."""
        status_dir = tempfile.mkdtemp(prefix="graft-admin-status-")
        proc = self.client._submit(
            "graft.jobs.AdminRunner",
            ["version", self.client.table_dir, status_dir])
        st = self._status(status_dir, "version", proc)
        if st.get("state") != "OK":
            raise RuntimeError(f"version probe failed: {st.get('error')}")
        return st["version"]

    def set_properties(self, updates):
        """Versioned table-property edits (aggregation / filter /
        transform / index): one metadata transaction, validated against
        the schema; aggregation may only change while the table is
        empty. E.g. set_properties({"filter": "ageOff(ts,86400000)"})."""
        status_dir = tempfile.mkdtemp(prefix="graft-admin-status-")
        jfile = os.path.join(status_dir, ".props.job.json")
        with open(jfile, "w") as f:
            f.write(json.dumps({"updates": dict(updates)}))
        proc = self.client._submit(
            "graft.jobs.AdminRunner",
            ["set-properties", self.client.table_dir, "@" + jfile, status_dir])
        return self._status(status_dir, "set-properties", proc)

    def restore_to(self, version):
        """Roll the table's data back to `version`'s contents (one
        metadata commit, no data IO). Refused when the target's files
        were already garbage-collected."""
        status_dir = tempfile.mkdtemp(prefix="graft-admin-status-")
        proc = self.client._submit(
            "graft.jobs.AdminRunner",
            ["restore", self.client.table_dir, str(int(version)), status_dir])
        return self._status(status_dir, "restore", proc)

    def clone_at(self, dest_dir, version, shallow=False):
        """Clone the table AS OF `version` into `dest_dir`. Deep by
        default (data + sketches byte-copied — fully independent);
        `shallow=True` branches zero-copy: the clone references the
        source's files by absolute path, so branching any size of table
        is one metadata write (keep the source's GC retention pinned
        while shallow clones live). Returns the status dict."""
        status_dir = tempfile.mkdtemp(prefix="graft-admin-status-")
        args = ["clone", self.client.table_dir, dest_dir, str(int(version)), status_dir]
        if shallow:
            args.append("--shallow")
        proc = self.client._submit("graft.jobs.AdminRunner", args)
        return self._status(status_dir, "clone", proc)

    @staticmethod
    def _status(status_dir, op_id, proc):
        status_file = os.path.join(status_dir, f"{op_id}.status.json")
        if os.path.exists(status_file):
            with open(status_file) as f:
                return json.load(f)
        return {"op": op_id, "id": op_id, "state": "FAILED",
                "error": (proc.stderr or "")[-2000:]}
