"""Large-scale training-data pipeline operators (SURVEY §7.2 Phase 5).

The reference has no analog for these — they are the 100 TB extension goals:
deduplication (exact + near-dup), text analysis, similarity search over
embeddings, and multimodal binary-column plumbing. Every operator here is:

- **JVM-side by default**: built on `pyspark.sql.functions` and SQL
  higher-order functions (`transform`/`aggregate`/`zip_with`), which run in
  whole-stage codegen. Python appears only in the multimodal path, as
  Arrow-batched `mapInPandas` (never row-at-a-time UDFs).
- **bucketed, never all-pairs**: near-dup candidate generation goes through
  MinHash-LSH bands / SimHash buckets / hyperplane buckets, so the shuffle
  carries (doc_id, bucket_key) pairs, not documents crossed with documents.
- **oracle-checked**: each registered query has a DuckDB-expressible oracle
  (both engines share md5, list lambdas, and integer bit ops, so even the
  MinHash signatures are bit-identical across engines).

Importing this package registers q21+ in the main query registry.
"""

from smartbulkcopy_spark.pipeline import (  # noqa: F401  (self-registering)
    curate,
    dedup,
    ensemble,
    ingest,
    multimodal,
    pack,
    similarity,
    sketch,
    text,
)
