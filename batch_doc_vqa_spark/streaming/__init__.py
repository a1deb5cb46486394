from .event_rollup import hourly_rollup_stream, extraction_stream  # noqa: F401
