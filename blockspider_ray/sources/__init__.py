from .pages import PageStore  # noqa: F401
