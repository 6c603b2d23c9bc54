"""PySpark-native ETL/analytics engine.

A ground-up re-expression of the capabilities prescribed by the reference
repo ``Kyureeus-Edtech/SSN-college-software-architecture-Assignments-``
(an assignment spec for Python ETL connectors: Extract from REST APIs,
Transform JSON, Load into a ``<connector>_raw`` collection —
``/root/reference/README.md:20-28``), rebuilt Spark-first:

- connectors are PySpark DataFrame sources (``sources/``),
- the Transform stage is the Catalyst logical plan (``operators/``,
  ``functions/``),
- the Load stage is an audited, validated DataFrame write (``sources/sink.py``),
- incremental ingestion is Structured Streaming (``streaming/``),
- plus LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) designed for 100 TB scale.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference's published README.
"""

from .session import build_session, tune_session
from .catalog import Catalog, TABLE_NAMES
from .registry import register, all_queries, all_oracles, load_all

__version__ = "0.1.0"

__all__ = [
    "build_session",
    "tune_session",
    "Catalog",
    "TABLE_NAMES",
    "register",
    "all_queries",
    "all_oracles",
    "load_all",
    "__version__",
]
