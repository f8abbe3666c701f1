from . import batched, bls, common, gd  # noqa: F401
from .common import SolveResult, SolveStats  # noqa: F401
