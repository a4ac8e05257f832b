"""Physical-plan inspection — the engine's scale self-checks.

The reference inherits Catalyst invisibly (SURVEY §4); we make the
inherited guarantees ASSERTABLE so a regression that silently drops a
broadcast, un-pushes a filter, or widens a scan fails tests instead of
surfacing as a 100 TB incident.
"""
