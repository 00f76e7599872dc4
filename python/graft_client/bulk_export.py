"""Bulk export, mirroring the reference Python client's bulk-export
surface (reference: python/src/sleeper/bulk_export.py — a
BulkExportQuery of `{"exportId"}` sent to the export queue). graft's
portable transport drives `graft.jobs.BulkExportRunner` through
spark-submit: the whole table (merged, sorted, aggregated — the engine's
M8 semantics) lands as parquet under `<out_base>/<export_id>/`.
"""

import json
import os
import tempfile
import uuid


class BulkExportQuery:
    def __init__(self, export_id=None):
        self.export_id = export_id or str(uuid.uuid4())


class BulkExportResult:
    def __init__(self, status: dict):
        self.export_id = status.get("exportId")
        self.state = status.get("state")
        self.row_count = status.get("rowCount")
        self.location = status.get("location")
        self.error = status.get("error")

    @property
    def completed(self):
        return self.state == "COMPLETED" and self.error is None

    def rows(self):
        """Exported rows as a list of dicts (requires pyarrow)."""
        import pyarrow.parquet as pq  # optional dependency, import lazily
        if not self.location or not os.path.isdir(self.location):
            return []
        return pq.read_table(self.location).to_pylist()

    def __repr__(self):
        return (f"BulkExportResult(export_id={self.export_id!r}, "
                f"state={self.state!r}, row_count={self.row_count})")


class BulkExportSender:
    """Runs bulk exports for a client's table (reference:
    BulkExportSender.send — there to SQS, here through spark-submit)."""

    def __init__(self, client):
        self.client = client

    def send(self, query: BulkExportQuery = None, out_base=None) -> BulkExportResult:
        query = query or BulkExportQuery()
        out_base = out_base or tempfile.mkdtemp(prefix="graft-export-")
        proc = self.client._submit(
            "graft.jobs.BulkExportRunner",
            [self.client.table_dir, out_base, query.export_id])
        status_file = os.path.join(out_base, f"{query.export_id}.status.json")
        if os.path.exists(status_file):
            with open(status_file) as f:
                return BulkExportResult(json.load(f))
        return BulkExportResult({
            "exportId": query.export_id, "state": "FAILED", "rowCount": 0,
            "location": os.path.join(out_base, query.export_id),
            "error": (proc.stderr or "")[-2000:]})
