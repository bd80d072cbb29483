"""LLM-training-data operators (additive — beyond the reference).

The reference stops at pandas/numpy/sklearn semantics; a 100 TB
training-data pipeline additionally needs dedup, similarity search,
text analysis, and multimodal plumbing. Everything here is built on
the same Spark-first discipline as the rest of the engine: built-in
higher-order functions (JVM-side) for the hot path, Arrow-batched
pandas UDFs only where semantics force it, and hash functions chosen
to be portable (md5) so results are oracle-checkable in any engine.
"""
