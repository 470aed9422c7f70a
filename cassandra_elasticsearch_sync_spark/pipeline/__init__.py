"""LLM-training-data pipeline operators (SURVEY.md section 2.K).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search, text analysis, and multimodal-column
plumbing - the mandated extension beyond the reference's sync surface
(BASELINE.json:6), each designed for 100 TB corpora.
"""
