"""lakeflow — a PySpark-native data-lake ETL & analytics engine.

Brand-new engine (not a port) providing the query and data-processing
capabilities of the reference project ``Tamar-sunbit/datalake_etls``
(see SURVEY.md), re-expressed Spark-first: lazy DataFrame/SQL plans,
Catalyst optimization, distributed columnar execution. Adds the full
relational inventory, Structured Streaming ingestion, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.
"""

from lakeflow.session import get_spark
from lakeflow.catalog import load_table, load_tables, register_views

__all__ = ["get_spark", "load_table", "load_tables", "register_views"]
__version__ = "0.1.0"
