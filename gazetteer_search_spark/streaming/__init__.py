from gazetteer_search_spark.streaming.events import (  # noqa: F401
    hourly_event_aggregates,
    read_events_stream,
    run_events_stream_once,
)
