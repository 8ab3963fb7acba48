from .fetch import FetchSim  # noqa: F401
from .extractors import extract_batch  # noqa: F401
from .links import RouteLinks  # noqa: F401
from .sinks import write_sinks  # noqa: F401
