from .worlds import sql_world_for, world_for

__all__ = ["world_for", "sql_world_for"]
