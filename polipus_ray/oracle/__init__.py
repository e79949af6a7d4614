from .simulator import SimResult, simulate_crawl

__all__ = ["SimResult", "simulate_crawl"]
