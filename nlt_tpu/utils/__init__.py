from . import config, io, logging, net, math, geom, img, tensor  # noqa: F401
