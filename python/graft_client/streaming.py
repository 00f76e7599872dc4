"""Streaming surfaces through spark-submit (`graft.streaming.StreamRunner`):
the change-data-feed consumer (puts AND deletes with _op /
_commit_version / _commit_seq) and the native streaming sink — the
Python reach into the engine's two streaming endpoints, same
thin-transport contract as ingest/merge/admin (process invocation +
file IO only, no JVM linkage).
"""

import json
import os
import shutil
import tempfile
import uuid


class ChangeFeedReader:
    """Incremental change-data-feed consumer.

    Owns a checkpoint directory: every `drain()` delivers exactly the
    changes committed since the previous drain (the first drain is the
    table snapshot including pending delete markers), appended as
    parquet under `out_dir`. Rows carry the table columns plus `_op`
    ("put" | "delete"), `_commit_version`, and `_commit_seq`; resolving
    per key by (version, seq) with puts winning ties reproduces the
    table's own reads.
    """

    def __init__(self, client, out_dir=None, checkpoint_dir=None):
        self.client = client
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="graft-feed-out-")
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
            prefix="graft-feed-cp-")
        self._drained_once = False

    def drain(self):
        """Deliver all changes up to the table's current version.
        Returns the status dict ({"op", "state", "endVersion", "error"})."""
        status_dir = tempfile.mkdtemp(prefix="graft-feed-status-")
        proc = self.client._submit(
            "graft.streaming.StreamRunner",
            ["feed", self.client.table_dir, self.out_dir,
             self.checkpoint_dir, status_dir])
        st = _status(status_dir, "feed", proc)
        if st.get("state") == "OK":
            self._drained_once = True
        return st

    def rows(self):
        """Every change delivered so far (cumulative across drains) as a
        list of dicts (requires pyarrow)."""
        import pyarrow.parquet as pq  # optional dependency, import lazily
        if not os.path.isdir(self.out_dir):
            return []
        files = [os.path.join(self.out_dir, f)
                 for f in os.listdir(self.out_dir) if f.endswith(".parquet")]
        if not files:
            return []
        out = []
        for f in sorted(files):
            out.extend(pq.read_table(f).to_pylist())
        return out

    def resolve(self, key_cols):
        """Materialize the feed to final table state: newest
        (_commit_version, _commit_seq) wins per key, puts win ties,
        deletes drop the key. `key_cols` names the table's row-key
        columns. Returns {key_tuple: row_dict}."""
        key_cols = list(key_cols)
        best = {}
        for r in self.rows():
            k = tuple(r[c] for c in key_cols)
            rank = (r["_commit_version"], r["_commit_seq"],
                    1 if r["_op"] == "put" else 0)
            if k not in best or rank > best[k][0]:
                best[k] = (rank, r)
        return {k: r for k, (rank, r) in best.items() if r["_op"] == "put"}


class StreamingSinkWriter:
    """Exactly-once streaming writes through the native sink.

    `add(files)` stages parquet batches into the inbox; `drain()` lands
    everything staged since the last drain as atomic epochs (one write
    generation each — `last(...)` tables resolve batches in drain
    order). Re-draining with nothing new is a no-op; a re-submitted
    drain after a crash neither re-lands rows nor advances state.
    """

    def __init__(self, client, inbox_dir=None, checkpoint_dir=None):
        self.client = client
        self.inbox_dir = inbox_dir or tempfile.mkdtemp(prefix="graft-sink-in-")
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
            prefix="graft-sink-cp-")

    def add(self, files):
        """Stage parquet files (copied into the inbox)."""
        staged = []
        for f in files:
            dest = os.path.join(self.inbox_dir,
                                f"{uuid.uuid4().hex[:12]}-{os.path.basename(f)}")
            shutil.copyfile(f, dest)
            staged.append(dest)
        return staged

    def drain(self):
        """Land every staged-but-unconsumed batch. Returns the status
        dict ({"op", "state", "endVersion", "error"})."""
        status_dir = tempfile.mkdtemp(prefix="graft-sink-status-")
        proc = self.client._submit(
            "graft.streaming.StreamRunner",
            ["sink", self.client.table_dir, self.inbox_dir,
             self.checkpoint_dir, status_dir])
        return _status(status_dir, "sink", proc)


def _status(status_dir, op, proc):
    status_file = os.path.join(status_dir, f"{op}.status.json")
    if os.path.exists(status_file):
        with open(status_file) as f:
            return json.load(f)
    return {"op": op, "state": "FAILED",
            "error": (proc.stderr or "")[-2000:]}
