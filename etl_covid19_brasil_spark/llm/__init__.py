"""Scale-path LLM-data algorithms: MinHash/SimHash near-dup, LSH ANN,
multimodal column plumbing."""
