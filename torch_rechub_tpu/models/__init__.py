from . import ranking

__all__ = ["ranking"]
