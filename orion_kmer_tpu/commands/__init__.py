from . import build, classify, compare, count, profile, query, sketch  # noqa: F401
