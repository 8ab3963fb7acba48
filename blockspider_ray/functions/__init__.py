from . import urls, extract, robots, text  # noqa: F401
