"""Thin Python client for the graft Spark analytics engine.

Mirrors the reference system's Python client surface (exact-key and
range queries against a table) over graft's out-of-process interchange:
the client writes the query JSON, submits `graft.query.QueryRunner`
via spark-submit, and reads back parquet results plus a machine-readable
status file. No JVM linkage, no pyspark dependency — just subprocess +
files (pyarrow, if installed, decodes result rows).
"""

from .query import Range, Region, Query
from .client import GraftClient, QueryResult
from .ingest import IngestJob, IngestJobSender
from .ingest_batcher import IngestBatcher
from .merge import MergeJob, MergeJobSender
from .admin import DeleteJob, AdminClient
from .bulk_export import BulkExportQuery, BulkExportResult, BulkExportSender
from .web_socket_query import (WebSocketQueryProcessor, WebSocketResultsServer,
                               fold_batches)
from .streaming import ChangeFeedReader, StreamingSinkWriter

__all__ = ["Range", "Region", "Query", "GraftClient", "QueryResult",
           "IngestJob", "IngestJobSender", "IngestBatcher",
           "MergeJob", "MergeJobSender", "DeleteJob", "AdminClient",
           "BulkExportQuery", "BulkExportResult", "BulkExportSender",
           "WebSocketQueryProcessor", "WebSocketResultsServer", "fold_batches",
           "ChangeFeedReader", "StreamingSinkWriter"]
