from lakeflow.sources.files import read_files
from lakeflow.sources.ndjson import (
    read_double_encoded_ndjson,
    read_json_doc,
    read_ndjson,
)
from lakeflow.sources.kafka_dump import read_kafka_topic_dump
from lakeflow.sources.mongo_export import read_mongo_export

__all__ = [
    "read_files",
    "read_ndjson",
    "read_json_doc",
    "read_double_encoded_ndjson",
    "read_kafka_topic_dump",
    "read_mongo_export",
]
