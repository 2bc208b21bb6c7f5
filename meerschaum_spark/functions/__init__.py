"""Training-data pipeline operator library: text analysis, dedup families,
similarity search, multimodal column plumbing. All builders are pure
DataFrame transforms (JVM-side, codegen'd) unless a pandas UDF is the only
way to express the semantics."""
