"""lakeflow — a PySpark-native batch + streaming lakehouse analytics engine.

A library-shaped re-expression of the capability surface of
``manhtdxxx/batch-and-stream-pipeline-via-lakehouse`` (see SURVEY.md): medallion
(bronze → silver → gold) pipelines, schema normalization / cleaning transforms,
ranked deduplication, incremental high-watermark loads, SCD Type 1/2 merges,
watermarked tumbling-window aggregation, and broadcast-lookup dimension joins —
plus LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Everything is idiomatic Spark DataFrame / SQL / Structured Streaming; no RDDs,
no custom Catalyst rules. UDFs appear only where built-ins genuinely cannot
express the semantics (and then as Arrow-batched pandas UDFs).
"""

from lakeflow.session import get_session, stop_session
from lakeflow.catalog import TABLES, load_table, register_views
from lakeflow.tables import (
    CommitConflictError,
    TableCatalog,
    VersionedTable,
    table_diff,
)
from lakeflow.quality import (
    Expectation,
    ExpectationFailedError,
    enforce,
    expectation_report,
    split,
)
from lakeflow.sqlx import LakehouseSQL

__all__ = [
    "get_session",
    "stop_session",
    "TABLES",
    "load_table",
    "register_views",
    "VersionedTable",
    "TableCatalog",
    "CommitConflictError",
    "table_diff",
    "Expectation",
    "ExpectationFailedError",
    "enforce",
    "expectation_report",
    "split",
    "LakehouseSQL",
]

__version__ = "0.1.0"
