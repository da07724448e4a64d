# importing populates the query registry
from . import dedup, events, multimodal, relational, similarity, text  # noqa: F401
