from incubator_hugegraph_computer_spark.streaming.events import (  # noqa: F401
    windowed_event_counts,
    stream_windowed_event_counts,
)
