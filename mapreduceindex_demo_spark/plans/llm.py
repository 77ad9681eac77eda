"""LLM-data-pipeline query suite — populated in phase 4 (SURVEY §7)."""
