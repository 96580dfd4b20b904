from . import calendar, waterfall  # noqa: F401
