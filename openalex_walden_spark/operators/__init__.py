"""Composite relational operators (MERGE emulation, change detection)."""
