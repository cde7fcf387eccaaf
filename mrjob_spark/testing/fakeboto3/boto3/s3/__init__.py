from . import transfer  # noqa: F401
