"""mapreduceindex_demo_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the *capabilities* of
``AnkitPrabhu/MapReduceIndex-Demo`` (a Couchbase secondary-index projector
with user-programmable JS map functions; see ``SURVEY.md``) as an idiomatic
Spark engine:

- Relational/SQL query layer (scan/filter/project/join/agg/window/sort/setop)
  built on the DataFrame API so Catalyst provides predicate pushdown, column
  pruning, join planning and AQE for free (the reference has no optimizer;
  SURVEY §4).
- A programmable **map-index subsystem** (the reference's actual novelty:
  ``OnMap(meta, doc)`` + ``emit(...)`` → incrementally maintained secondary
  index; reference ``indexjs.go:73-191``) re-expressed as
  expression-evaluated or UDF-evaluated index builds with MERGE-style
  incremental maintenance.
- Order-preserving cross-type key collation (reference
  ``JSEvaluate.go:56-130``) as a deterministic binary encoding.
- LLM-data-pipeline operators: dedup (exact/minhash/simhash/jaccard),
  similarity search over embeddings, text analysis, multimodal columns.
- Structured Streaming maintenance (watermarks, windows, checkpointed
  ``foreachBatch`` upserts) mirroring the reference's DCP stream semantics.

Everything is designed partition-parallel for a large cluster: no driver-side
collects in any operator path, broadcast joins for small dims, decimal
arithmetic for deterministic, order-independent aggregation.
"""

__version__ = "0.1.0"

from mapreduceindex_demo_spark.session import get_spark, load_tables  # noqa: F401
