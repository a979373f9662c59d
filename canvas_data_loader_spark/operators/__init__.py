"""Engine operators: merge/upsert, dedup family, similarity, text ops."""
