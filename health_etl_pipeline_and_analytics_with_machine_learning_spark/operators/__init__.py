from . import relational  # noqa: F401 — populates the query registry on import
