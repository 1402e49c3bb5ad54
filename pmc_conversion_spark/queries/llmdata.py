"""Registry: LLM-data-pipeline operators (BASELINE.json north star):
dedup, similarity search, text analysis, multimodal plumbing.

Filled out alongside pmc_conversion_spark/functions/{dedup,similarity,
text,multimodal}.
"""
