from . import criteo, synthetic
