"""Training-data pipeline operators: dedup (document- and span-level),
similarity search, text analysis, PII scrub, eval-set decontamination,
deterministic sampling/mixing, chunking/packing, multimodal column
plumbing."""
