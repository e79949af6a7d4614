from .cuckoo import CuckooFilter
from .shards import SeenShardPool, UrlSeenShard

__all__ = ["CuckooFilter", "SeenShardPool", "UrlSeenShard"]
