from .hard_concrete import (
    cdf_qz,
    deterministic_z,
    quantile_concrete,
    sample_z,
)
from .l0_module import L0Module, NLVRL0Module, VQAL0Module, XVLML0Module

__all__ = [
    "cdf_qz",
    "deterministic_z",
    "quantile_concrete",
    "sample_z",
    "L0Module",
    "NLVRL0Module",
    "VQAL0Module",
    "XVLML0Module",
]
