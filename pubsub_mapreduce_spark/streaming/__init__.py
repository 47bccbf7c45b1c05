from . import pipeline, sinks  # noqa: F401
