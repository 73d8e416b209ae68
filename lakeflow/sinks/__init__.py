from lakeflow.sinks.tables import (
    drop_table,
    run_ddl_script,
    save_table,
    table_exists,
)
from lakeflow.sinks.ingest_state import IngestState

__all__ = [
    "save_table",
    "drop_table",
    "table_exists",
    "run_ddl_script",
    "IngestState",
]
