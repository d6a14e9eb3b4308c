"""Engine operators: write/merge/recon plus LLM-data-pipeline ops
(dedup, similarity search, text analysis, multimodal plumbing)."""
