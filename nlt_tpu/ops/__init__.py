from . import (  # noqa: F401
    color,
    cubic_spline,
    distribution,
    general_loss,
    resample,
    safe_math,
    wavelet,
)
