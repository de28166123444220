"""Event-time window queries (tumbling/sliding/session) — filled in at
M4. See SURVEY.md §2B."""
