from .jobs import stream_events_daily, streaming_daily_agg  # noqa: F401
