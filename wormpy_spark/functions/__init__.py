from . import extract, imageops, urlnorm  # noqa: F401
