from .cuckoo import CuckooFilter, SeenSet  # noqa: F401
from .frontier import HostFrontier, TokenBucket  # noqa: F401
from .window import RollbackWindow, WindowEntry  # noqa: F401
from . import checkpoint  # noqa: F401
