"""LLM-data-pipeline function library (SURVEY §7 phase 4; BASELINE.json
north star): text analysis, deduplication, similarity search, multimodal
column handling. All builders return Spark Column expressions that stay
JVM-side (whole-stage codegen) — Python UDFs appear only in the multimodal
decode stubs where external libs would be required."""
