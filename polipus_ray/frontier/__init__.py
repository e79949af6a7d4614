from .engine import CrawlEngine
from .spill import FrontierSpill

__all__ = ["CrawlEngine", "FrontierSpill"]
