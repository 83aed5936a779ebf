from . import criteo, feed, synthetic
from .feed import make_packed_feed
