from . import events_stream  # noqa: F401
