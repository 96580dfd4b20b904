from . import file_ingest, windowed  # noqa: F401
