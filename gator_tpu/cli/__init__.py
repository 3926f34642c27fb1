from . import common, demo, test, train  # noqa: F401
