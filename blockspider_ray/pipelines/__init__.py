from . import relational, windows, dedup, textstats, similarity  # noqa: F401
