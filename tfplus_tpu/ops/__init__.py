from . import rowops
from .rowops import gather_rows, scatter_rows
