from . import attention, layers
