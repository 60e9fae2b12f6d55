from .battery import REGISTRY, Q  # noqa: F401
from . import battery_ext  # noqa: F401  (registers q11+ into REGISTRY)
