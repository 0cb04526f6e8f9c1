"""Scalar / vector function layer.

Reference analog: the reference's builtin function registry
(/root/reference/src/include/execution/ast/builtins.h) and vectorized
kernels (/root/reference/src/execution/sql/vector_operations/).  Here the
equivalents are pyspark.sql.functions built-ins (JVM, whole-stage
codegen) plus a small set of Arrow-vectorized pandas UDFs for what the
built-ins cannot express.
"""
