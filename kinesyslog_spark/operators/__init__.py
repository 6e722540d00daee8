"""Reusable operator building blocks (Spark column-expression factories).

Everything here is pure `pyspark.sql.functions` composition — JVM-side,
whole-stage-codegen friendly. No Python UDFs in this package; the only
pandas UDFs in the engine live in operators/multimodal.py (opaque binary
decode) and streaming/ (stateful reassembly), where built-ins genuinely
cannot express the semantics.
"""
