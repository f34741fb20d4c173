"""Expression builders (pure ``pyspark.sql.functions`` compositions).

Everything here returns Column expressions — no Python UDFs — so the
hot path stays inside whole-stage codegen on the JVM.
"""
