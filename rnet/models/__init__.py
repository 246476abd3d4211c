from .rn import RN  # noqa: F401
