"""LLM-data-pipeline queries (dedup / similarity / text / multimodal) —
filled in at M5. See SURVEY.md §2B."""
