from . import rkhs, robot  # noqa: F401
