"""Map-index query suite — populated in phase 2 (SURVEY §7)."""
