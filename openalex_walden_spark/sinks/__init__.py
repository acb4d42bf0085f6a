"""Output connectors (SURVEY.md §2.1 S5-S7): bulk-index sink, JSON
snapshot export, JDBC."""
