from .collectives import ici_bench

__all__ = ["ici_bench"]
