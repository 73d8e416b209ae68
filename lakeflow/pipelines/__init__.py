from lakeflow.pipelines.mailgun import import_mailgun_events
from lakeflow.pipelines.iterable_events import import_iterable_events
from lakeflow.pipelines.mongo import import_mongo_notifications
from lakeflow.pipelines.kafka_topics import import_topic_dump

__all__ = [
    "import_mailgun_events",
    "import_iterable_events",
    "import_mongo_notifications",
    "import_topic_dump",
]
