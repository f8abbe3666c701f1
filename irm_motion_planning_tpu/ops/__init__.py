from . import costs, scenario  # noqa: F401
