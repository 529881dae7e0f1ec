"""Scalar/vectorized function library: deterministic hashing, HTML text
extraction, mention detection. Hot paths are Column expressions; Python
appears only as Arrow-batched pandas UDFs."""
