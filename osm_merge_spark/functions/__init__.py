"""Column-expression and pandas-UDF kernels.

Everything here is either (a) a pure Catalyst expression tree — runs inside
whole-stage codegen, JVM-side, no Python — or (b) an Arrow-vectorized pandas
UDF for semantics Catalyst cannot express (ray-cast PIP, point→segment
distance, indel fuzzy ratio). Per-row Python UDFs are banned.
"""
