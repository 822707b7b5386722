from .transformer import SimpleTransformer
from .mpnn import MPNN
from .gps import GPSModel

__all__ = ["SimpleTransformer", "MPNN", "GPSModel"]
