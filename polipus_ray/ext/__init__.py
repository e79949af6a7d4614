from .plugins import Plugin, SleeperPlugin

__all__ = ["Plugin", "SleeperPlugin"]
