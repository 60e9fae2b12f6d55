from .battery import REGISTRY, Q  # noqa: F401
from . import battery_ext  # noqa: F401  (registers q11+ into REGISTRY)
from . import battery_rel  # noqa: F401  (registers q22+ into REGISTRY)
