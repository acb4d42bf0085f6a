"""Input connectors (SURVEY.md §2.1 S1-S4): JSON/XML file sources,
batch + incremental."""
