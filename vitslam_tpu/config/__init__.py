from .loader import DotDict, compose, instantiate, load_yaml

__all__ = ["DotDict", "compose", "instantiate", "load_yaml"]
