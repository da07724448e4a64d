from . import cleaning, textcase  # noqa: F401
