from . import calendar, waterfall  # noqa: F401
from .caching import release_cached_intermediates, tracked_persist  # noqa: F401
