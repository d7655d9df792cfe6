from . import imagegen, webgen  # noqa: F401
