from . import packing
