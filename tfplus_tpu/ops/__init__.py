from . import rowops
from .rowops import gather_rows, scatter_rows
from . import flash_attention
from .flash_attention import flash_attention as fmha, reference_attention
