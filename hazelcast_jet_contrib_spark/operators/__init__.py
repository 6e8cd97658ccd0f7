"""Dataset-level operators: deduplication (exact / MinHash-LSH / SimHash
/ n-gram Jaccard / embedding cosine), similarity search, event-time
windows, multimodal column plumbing. All DataFrame→DataFrame transforms
— no driver-side materialization — designed for 100 TB inputs.
"""
