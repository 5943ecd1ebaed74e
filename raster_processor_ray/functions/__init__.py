from . import datetime_fns, strings  # noqa: F401
