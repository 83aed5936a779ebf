from . import packing, profiling
