"""Large-scale training-data pipeline operators.

Beyond the reference generator's surface (SURVEY.md §2.3 note), this
package adds the operators a 100 TB LLM-data pipeline needs: exact and
near deduplication, similarity search over embeddings, multimodal
column plumbing, and text analysis. Everything is expressed with
native ``pyspark.sql.functions`` higher-order expressions (JVM-side,
whole-stage codegen) — pandas UDFs appear only where Spark genuinely
lacks the primitive.
"""
