"""Engine operators — DataFrame-in / DataFrame-out, scale-first.

Each module implements one family from SURVEY.md §2 with the reference's
observable semantics, re-planned for Spark's execution model (partition
pruning, broadcast, partial top-k) rather than translated from the
reference's Python/ChromaDB dataflow.
"""
