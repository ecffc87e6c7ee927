from . import linalg, rng, intersect, tonemap  # noqa: F401
