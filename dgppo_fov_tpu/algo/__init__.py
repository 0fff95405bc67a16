from .registry import make_algo

__all__ = ["make_algo"]
