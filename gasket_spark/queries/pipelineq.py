"""Pipeline-operator queries (gasket pipe/run/fork/map/reduce) — filled
in with M1's engine. See SURVEY.md §2A."""
