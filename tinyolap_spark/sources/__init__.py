from . import starschema  # noqa: F401
