# importing populates the query registry
from . import curation, dedup, events, multimodal, relational, similarity, text  # noqa: F401
