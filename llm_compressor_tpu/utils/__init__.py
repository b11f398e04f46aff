from .logging import LOGGER, colorstr, init_seeds

__all__ = ["LOGGER", "colorstr", "init_seeds"]
