from . import distance, quantize  # noqa: F401
