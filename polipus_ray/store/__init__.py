from .pagestore import DevNullPageStore, MemoryPageStore, PageStore, ParquetPageStore, make_store

__all__ = ["PageStore", "ParquetPageStore", "MemoryPageStore", "DevNullPageStore", "make_store"]
