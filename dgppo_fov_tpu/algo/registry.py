"""Algorithm registry.

Behavioral parity reference: /root/reference/dgppo/algo/__init__.py:8-18.
"""
from .base import Algorithm


def make_algo(algo: str, **kwargs) -> Algorithm:
    if algo == "informarl":
        from .informarl import InforMARL

        return InforMARL(**kwargs)
    if algo == "informarl_lagr":
        from .informarl_lagr import InforMARLLagr

        return InforMARLLagr(**kwargs)
    if algo == "dgppo":
        from .dgppo import DGPPO

        return DGPPO(**kwargs)
    if algo == "hcbfcrpo":
        from .hcbfcrpo import HCBFCRPO

        return HCBFCRPO(**kwargs)
    raise ValueError(f"Algorithm {algo} not implemented.")
