"""The spark-submit transport: write query JSON, run
graft.query.QueryRunner, read back status + parquet.

This is deliberately a THIN wrapper — all query semantics live in the
engine. The client's whole job is process invocation and file IO, so a
non-JVM service can submit queries with nothing but a Spark
distribution and the graft jar on disk (the same boundary as the
reference's Python client, which submits query JSON to the serving
tier rather than linking the engine).
"""

import json
import os
import subprocess
import tempfile
import uuid

from .query import Query, Region


class QueryResult:
    """Terminal status of one query plus the result location."""

    def __init__(self, status: dict, result_dir: str):
        self.query_id = status.get("queryId")
        self.state = status.get("state")
        self.row_count = status.get("rowCount")
        self.locations = status.get("locations", [])
        self.error = status.get("error")
        self.result_dir = result_dir

    @property
    def completed(self):
        return self.state == "COMPLETED" and self.error is None

    def rows(self):
        """Result rows as a list of dicts (requires pyarrow)."""
        import pyarrow.parquet as pq  # optional dependency, import lazily
        if not os.path.isdir(self.result_dir):
            return []
        return pq.read_table(self.result_dir).to_pylist()

    def __repr__(self):
        return (f"QueryResult(query_id={self.query_id!r}, state={self.state!r}, "
                f"row_count={self.row_count}, error={self.error!r})")


class GraftClient:
    """Submit queries against one graft table directory.

    jar:          the packaged graft jar (target/scala-2.13/...jar)
    spark_submit: path to spark-submit (default: $SPARK_HOME/bin or PATH)
    master:       spark master for the runner JVM (default local[4])
    tracker_dir:  optional durable-tracker directory; when given, the
                  runner records its QUEUED -> IN_PROGRESS -> terminal
                  lifecycle there and `query_status` polls it from this
                  process (the cross-JVM status view).
    """

    def __init__(self, table_dir, jar, spark_submit=None, master="local[4]",
                 tracker_dir=None, extra_conf=None):
        self.table_dir = table_dir
        self.jar = jar
        self.spark_submit = spark_submit or self._default_spark_submit()
        self.master = master
        self.tracker_dir = tracker_dir
        self.extra_conf = dict(extra_conf or {})

    @staticmethod
    def _default_spark_submit():
        home = os.environ.get("SPARK_HOME")
        if home:
            return os.path.join(home, "bin", "spark-submit")
        return "spark-submit"

    def _submit(self, clazz, args):
        cmd = [self.spark_submit, "--master", self.master, "--class", clazz,
               "--conf", "spark.ui.enabled=false",
               "--conf", "spark.sql.shuffle.partitions=4"]
        for k, v in self.extra_conf.items():
            cmd += ["--conf", f"{k}={v}"]
        cmd += [self.jar] + list(args)
        return subprocess.run(cmd, capture_output=True, text=True)

    def run_query(self, query: Query, out_dir=None, as_of_version=None):
        """Execute a query; returns a QueryResult (parquet under
        `<out_dir>/<queryId>/`, status from `<queryId>.status.json`).
        `as_of_version` time-travels the read to a captured state-store
        version (see AdminClient.table_version)."""
        out_dir = out_dir or tempfile.mkdtemp(prefix="graft-query-")
        qfile = os.path.join(out_dir, f".{query.query_id}.query.json")
        with open(qfile, "w") as f:
            f.write(query.to_json())
        args = [self.table_dir, "@" + qfile, out_dir]
        if self.tracker_dir:
            args.append(self.tracker_dir)
        if as_of_version is not None:
            args.append(f"--as-of={int(as_of_version)}")
        proc = self._submit("graft.query.QueryRunner", args)
        status_file = os.path.join(out_dir, f"{query.query_id}.status.json")
        if os.path.exists(status_file):
            with open(status_file) as f:
                status = json.load(f)
        else:  # the runner died before writing status — surface stderr
            status = {"queryId": query.query_id, "state": "FAILED",
                      "rowCount": 0, "locations": [],
                      "error": (proc.stderr or "")[-2000:]}
        return QueryResult(status, os.path.join(out_dir, query.query_id))

    def exact_key_query(self, keys, query_id=None, requested_value_fields=None,
                        as_of_version=None):
        """keys: list of {field: value} dicts, e.g. [{"k": 7}, {"k": 33}]."""
        return self.run_query(Query(query_id=query_id, keys=keys,
                                    requested_value_fields=requested_value_fields),
                              as_of_version=as_of_version)

    def admin(self):
        """Admin surface: delete_keys / table_version / clone_at."""
        from .admin import AdminClient
        return AdminClient(self)

    def range_key_query(self, regions, query_id=None, requested_value_fields=None):
        """regions: list of Region (or raw {field: {min/max...}} dicts)."""
        rs = [r if isinstance(r, Region) else _raw_region(r) for r in regions]
        return self.run_query(Query(query_id=query_id, regions=rs,
                                    requested_value_fields=requested_value_fields))

    def query_status(self, query_id):
        """Latest tracker record for `query_id` from tracker_dir (set at
        construction) — readable while another process runs the query."""
        if not self.tracker_dir:
            raise ValueError("construct the client with tracker_dir to poll status")
        latest = None
        for name in sorted(os.listdir(self.tracker_dir)):
            if not (name.startswith("ev-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.tracker_dir, name)) as f:
                    rec = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if rec.get("queryId") == query_id and "subQueryId" not in rec:
                latest = rec  # files sort in commit order: last wins
        return latest

    def seed_demo_table(self, rows=50, split=25, agg_config=None):
        """Create + ingest the demo (k, v) table via TableSeeder —
        test/demo convenience, not a data path. `agg_config` sets the
        table's aggregationConfig (e.g. "last(v)" for a last-write-wins
        table the merge surface targets)."""
        args = [self.table_dir, str(rows), str(split)]
        if agg_config:
            args.append(agg_config)
        proc = self._submit("graft.query.TableSeeder", args)
        if proc.returncode != 0:
            raise RuntimeError(f"TableSeeder failed:\n{proc.stderr[-2000:]}")
        return self


def _raw_region(d):
    from .query import Range
    return Region({f: Range(min=r.get("min"),
                            min_inclusive=r.get("minInclusive", True),
                            max=r.get("max"),
                            max_inclusive=r.get("maxInclusive", False))
                   for f, r in d.items()})
