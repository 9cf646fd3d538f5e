from . import config, general, registry  # noqa: F401
