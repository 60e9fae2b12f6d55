from .battery import REGISTRY, Q  # noqa: F401
