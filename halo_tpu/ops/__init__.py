from . import hyperbolic
from .resize import resize_bilinear, resize_nearest
