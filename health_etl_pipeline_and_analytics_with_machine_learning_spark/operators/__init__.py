# importing populates the query registry
from . import advanced, curation, dedup, events, joins, multimodal, prep, relational, similarity, skew, text  # noqa: F401
