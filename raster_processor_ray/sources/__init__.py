from . import pages, samples, tables  # noqa: F401
