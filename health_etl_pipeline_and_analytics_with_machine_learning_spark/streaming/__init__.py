from . import enrich_stream, events_stream  # noqa: F401
