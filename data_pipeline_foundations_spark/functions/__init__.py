from . import money, enums, datetime_ops, text, hashing  # noqa: F401
