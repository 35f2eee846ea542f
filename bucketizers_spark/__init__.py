"""bucketizers_spark — a PySpark-native streaming bucketizer engine.

A from-scratch reimplementation of the fragmentation semantics of
TREEcg/bucketizers (reference at /root/reference, TypeScript) as an
idiomatic PySpark engine: batch operators expressed with DataFrame /
window functions, streaming operators with Structured Streaming
(watermarks, keyed state, exactly-once sinks).

The key design insight (SURVEY.md §7): every stateful counter in the
reference is a pure function of a deterministic per-key arrival rank
in `seq` order, so each strategy becomes a keyed, order-stable,
vectorized operator — no global lock, exact reference parity.
"""

__version__ = "0.1.0"

from bucketizers_spark.config import JobSpec, validate_spec  # noqa: F401
