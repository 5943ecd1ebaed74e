from . import cells, crs, hashing, utm  # noqa: F401
