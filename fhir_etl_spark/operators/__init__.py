"""Engine operators beyond plain relational algebra: text analysis, dedup
(exact and near-dup), similarity search, multimodal column plumbing, FHIR
document transforms (fhirize/prune/validate), and group membership."""
