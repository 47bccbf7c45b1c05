from . import dedup, multimodal, pipeline, relational, similarity, textops  # noqa: F401
