# importing populates the query registry
from . import advanced, curation, dedup, events, joins, multimodal, relational, similarity, text  # noqa: F401
