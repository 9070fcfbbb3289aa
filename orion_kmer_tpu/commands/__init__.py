from . import build, classify, compare, count, query  # noqa: F401
