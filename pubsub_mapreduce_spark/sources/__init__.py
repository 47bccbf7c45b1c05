from . import knobs  # noqa: F401
