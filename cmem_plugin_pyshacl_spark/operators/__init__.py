"""Relational operators: label precedence, graph surgery, entities output,
dedup family, similarity search, text analysis, multimodal plumbing."""
