"""Scale-oriented data operators: deduplication, similarity search,
multimodal column plumbing. These are the LLM-training-data operators
the rebuild contract adds on top of the reference's pipeline surface
(BASELINE.json "north_star")."""
