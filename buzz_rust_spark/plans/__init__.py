from .analysis import referenced_tables

__all__ = ["referenced_tables"]
